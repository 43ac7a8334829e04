"""End-to-end video throughput benchmark — HOST SIDE INCLUDED.

The ≥1000 fps north star (BASELINE.md) is an end-to-end claim: frames must
move RAM -> device -> stylized -> JPEG -> container at that rate, not just
execute on the chip. This script measures each stage independently and
then the composed loop, against the workload of the reference frame loop
(/root/reference/video_transfer.py:160-214):

  device  — the fused stylize program, iterated INSIDE one compiled
            program (lax.fori_loop) with a readback fence: true device
            throughput, immune to relay RPC latency (PERF.md method).
  encode  — synthetic stylized frames already in RAM -> AsyncWriter
            JPEG-encode pool -> streaming AviWriter on disk. This is the
            pure host half; it scales with worker threads/cores.
  e2e     — the full dispatch loop: RAM frames -> uint8 upload -> device
            program (2 batches in flight) -> uint8 readback -> encode
            pool -> disk. RSS is sampled throughout so the memory-flat
            claim (streaming writer, bounded queues) is checked, not
            assumed.

Usage:
  python scripts/bench_video_e2e.py [--frames 2000] [--batch 64]
      [--size 512] [--workers N] [--host_only] [--out /tmp/bench_e2e.avi]

Prints one JSON line per stage and a final summary JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return 0.0


class RssSampler:
    """Background RSS sampler: start/peak/end, for the memory-flat check."""

    def __init__(self, period: float = 0.2):
        self.period = period
        self.samples = []
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._run, daemon=True)

    def _run(self):
        while not self._stop.wait(self.period):
            self.samples.append(rss_mb())

    def __enter__(self):
        self.samples = [rss_mb()]
        self._t.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._t.join()
        self.samples.append(rss_mb())

    @property
    def stats(self):
        return {"start_mb": round(self.samples[0], 1),
                "peak_mb": round(max(self.samples), 1),
                "end_mb": round(self.samples[-1], 1)}


def synth_frames(size: int, k: int = 16):
    """k distinct uint8 RGB frames (smooth gradients; JPEG-friendly)."""
    yy, xx = np.mgrid[0:size, 0:size]
    return [np.stack([(yy * 3 + i * 16) % 256, (xx * 5 + i * 8) % 256,
                      ((yy + xx) * 2 + i * 4) % 256], -1).astype(np.uint8)
            for i in range(k)]


def bench_encode(frames, n_frames, out_path, workers):
    """Host half alone: RAM frames -> encode pool -> streaming AVI."""
    from vstnet_tpu.io.video import AsyncWriter, AviWriter

    # single-thread encode cost first (the per-core number the pool scales)
    w1 = AviWriter(os.path.join(os.path.dirname(out_path) or ".",
                                "_enc_probe.avi"), fps=25)
    t0 = time.perf_counter()
    probe = min(64, n_frames)
    for i in range(probe):
        w1.write(frames[i % len(frames)])
    w1.close()
    ms_per_frame = (time.perf_counter() - t0) / probe * 1e3
    os.remove(w1.path)

    with RssSampler() as rs:
        aw = AsyncWriter(AviWriter(out_path, fps=25), depth=128,
                         workers=workers)
        t0 = time.perf_counter()
        for i in range(n_frames):
            aw.write(frames[i % len(frames)])
        aw.close()
        dt = time.perf_counter() - t0
    fps = n_frames / dt
    ncpu = os.cpu_count() or 1
    res = {"stage": "encode", "fps": round(fps, 1),
           "frames": n_frames, "workers": workers, "host_cores": ncpu,
           "encode_ms_per_frame_1thread": round(ms_per_frame, 2),
           "cores_needed_for_1000fps": round(ms_per_frame, 2),
           "rss": rs.stats}
    print(json.dumps(res), flush=True)
    os.remove(out_path)
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=64,
                    help="frames per device dispatch (per chip)")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--workers", type=int, default=None,
                    help="encode pool threads (default: host cores, max 8)")
    ap.add_argument("--host_only", action="store_true",
                    help="skip the device stages (no TPU needed)")
    ap.add_argument("--out", type=str, default="/tmp/bench_e2e.avi")
    args = ap.parse_args()

    workers = args.workers or min(os.cpu_count() or 1, 8)
    frames = synth_frames(args.size)

    enc = bench_encode(frames, args.frames, args.out, workers)
    if args.host_only:
        print(json.dumps({"stage": "summary", "e2e_fps": None,
                          "encode_fps": enc["fps"],
                          "note": "host_only"}), flush=True)
        return

    import jax
    import jax.numpy as jnp

    from vstnet_tpu.config import PHOTO_CONFIG
    from vstnet_tpu.io.video import AsyncWriter, AviWriter
    from vstnet_tpu.models import cwct
    from vstnet_tpu.models import revresnet_fast as rf
    from vstnet_tpu.models.pipeline import make_fused_video_fn
    from vstnet_tpu.models.revresnet import init_revresnet

    cfg = PHOTO_CONFIG
    params = init_revresnet(jax.random.PRNGKey(0), cfg)
    fast = rf.pack_revresnet(params, cfg, dtype=jnp.bfloat16)

    n_dev = jax.local_device_count()
    mesh = None
    if n_dev > 1:
        from vstnet_tpu.parallel import make_mesh, parallel_stylize_fused

        mesh = make_mesh(n_dev, axes=("data",))
        fused = parallel_stylize_fused(mesh, cfg, out_u8=True)
    else:
        fused = jax.jit(make_fused_video_fn(cfg, out_u8=True))
    batch_total = args.batch * max(n_dev, 1)

    style = jnp.asarray(
        np.random.default_rng(0).uniform(size=(1, args.size, args.size, 3)),
        jnp.bfloat16)
    zp = jax.jit(lambda s: rf.encode_fast(fast, s, cfg, packed_latent=True))(
        style)
    ls, mu_s = cwct.style_factors_packed(zp, cfg.latent_channels)

    @jax.jit
    def stylize_u8(fast, frames_u8, ls, mu_s):
        x = frames_u8.astype(jnp.float32) / 255.0
        return fused(fast, x, ls, mu_s)

    # ---- device stage: chained in-graph (relay-immune) -------------------
    ITERS = 8

    @jax.jit
    def device_chain(fast, frames, ls, mu_s):
        def body(_, x):
            zp = rf.encode_fast(fast, x, cfg, packed_latent=True)
            z_cs = cwct.transfer_with_factors_packed(
                zp, ls, mu_s, cfg.latent_channels)
            out = rf.decode_fast(fast, z_cs, cfg, packed_latent=True)
            return jnp.clip(out, 0.0, 1.0).astype(x.dtype)

        return jax.lax.fori_loop(0, ITERS, body, frames)

    dev_frames = jnp.asarray(
        np.random.default_rng(1).uniform(
            size=(batch_total, args.size, args.size, 3)), jnp.bfloat16)
    out = device_chain(fast, dev_frames, ls, mu_s)
    _ = np.asarray(out[0, 0, :4, 0])  # compile + warm + fence
    t0 = time.perf_counter()
    out = device_chain(fast, dev_frames, ls, mu_s)
    _ = np.asarray(out[0, 0, :4, 0])
    dev_fps = batch_total * ITERS / (time.perf_counter() - t0)
    print(json.dumps({"stage": "device", "fps": round(dev_fps, 1),
                      "batch": batch_total, "devices": n_dev}), flush=True)

    # ---- e2e stage: RAM -> device (2 in flight) -> encode pool -> disk ---
    n_batches = max(args.frames // batch_total, 1)
    n_frames = n_batches * batch_total
    batch_np = np.stack([frames[i % len(frames)]
                         for i in range(batch_total)])

    def upload(x):
        if mesh is not None:
            from vstnet_tpu.parallel import shard_batch

            return shard_batch(mesh, x)
        return jnp.asarray(x)

    # warm the u8 program
    warm = stylize_u8(fast, upload(batch_np), ls, mu_s)
    _ = np.asarray(warm[0, 0, :4, 0])

    with RssSampler() as rs:
        aw = AsyncWriter(AviWriter(args.out, fps=25), depth=2 * batch_total,
                         workers=workers)
        pending = []
        written = 0
        t0 = time.perf_counter()
        for b in range(n_batches):
            pending.append(stylize_u8(fast, upload(batch_np), ls, mu_s))
            while len(pending) > 2:  # 2 batches in flight on the device
                arr = np.asarray(pending.pop(0))
                for i in range(arr.shape[0]):
                    aw.write(arr[i])
                written += arr.shape[0]
        for p in pending:
            arr = np.asarray(p)
            for i in range(arr.shape[0]):
                aw.write(arr[i])
            written += arr.shape[0]
        aw.close()
        dt = time.perf_counter() - t0
    e2e_fps = written / dt
    out_mb = os.path.getsize(args.out) / 1e6
    os.remove(args.out)
    summary = {"stage": "summary",
               "e2e_fps": round(e2e_fps, 1),
               "device_fps": round(dev_fps, 1),
               "encode_fps": enc["fps"],
               "encode_ms_per_frame_1thread":
                   enc["encode_ms_per_frame_1thread"],
               "host_cores": os.cpu_count() or 1,
               "devices": n_dev,
               "frames": written, "size": args.size,
               "output_mb": round(out_mb, 1),
               "rss": rs.stats,
               "e2e_over_device_pct": round(100 * e2e_fps / dev_fps, 1)}
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
