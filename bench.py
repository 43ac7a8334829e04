"""Driver benchmark: stylized 512px frames/sec on one chip.

Measures the full stylize path (encode content -> cWCT -> decode) in the
video configuration: one style, precomputed factors, frames batched.
Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference runs the photo pipeline at ~800 ms @ 1024^2 on GPU
(project/image_style/vstnet.py:170) => ~200 ms @ 512^2 => ~5 frames/sec.
vs_baseline is frames_per_sec / 5.0. The north-star target is >=1000 fps
on a v5e-8, i.e. >=125 fps/chip (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import threading
import time

import numpy as np


_LOCAL_RECORD = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json")


def _last_measured() -> str:
    """Most recent recorded result — the newest BENCH_r*.json, or the
    session-local record a successful run leaves behind (whichever is
    newer by mtime) — derived, so it cannot go stale when perf moves."""
    import glob
    import re

    best = None
    for p in sorted(glob.glob(os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_r*.json"))):
        m = re.search(r"BENCH_r(\d+)", p)
        if m and (best is None or int(m.group(1)) > best[0]):
            best = (int(m.group(1)), p)
    path = best[1] if best else None
    if os.path.exists(_LOCAL_RECORD) and (
            path is None
            or os.path.getmtime(_LOCAL_RECORD) > os.path.getmtime(path)):
        path = _LOCAL_RECORD
    if path is None:
        return "no prior BENCH file"
    try:
        with open(path) as f:
            rec = json.load(f)
        rec = rec.get("parsed", rec)  # driver wraps the JSON line
        return (f"{rec.get('value')} {rec.get('unit', '')} "
                f"({os.path.basename(path)})").strip()
    except Exception as e:  # pragma: no cover - diagnostics only
        return f"unreadable {os.path.basename(path)}: {e}"


def _init_watchdog(seconds: float) -> threading.Event:
    """Device-backend hang guard. jax backend init through the axon relay
    BLOCKS indefinitely when the relay is down (observed: >300 s with no
    exception); without a watchdog the driver's bench run would record
    nothing at all. If the first compile+execute round trip hasn't
    completed within `seconds`, print an honest zero-value JSON line
    (metric contract preserved, detail says why) and exit."""
    done = threading.Event()

    def fire():
        if not done.wait(seconds):
            print(json.dumps({
                "metric": "stylized_512px_frames_per_sec_per_chip",
                "value": 0.0,
                "unit": "frames/sec",
                "vs_baseline": 0.0,
                "detail": {
                    "error": "device backend unreachable "
                             f"(no compile+execute within {seconds:.0f}s; "
                             "axon relay outage)",
                    "last_measured": _last_measured(),
                },
            }), flush=True)
            os._exit(0)

    threading.Thread(target=fire, daemon=True).start()
    return done


def main():
    ready = _init_watchdog(
        float(os.environ.get("VSTNET_BENCH_INIT_TIMEOUT", "900")))
    import jax
    import jax.numpy as jnp

    from vstnet_tpu.config import PHOTO_CONFIG
    from vstnet_tpu.models import cwct
    from vstnet_tpu.models import revresnet_fast as rf
    from vstnet_tpu.models.revresnet import init_revresnet

    cfg = PHOTO_CONFIG
    dtype = jnp.bfloat16  # inference fast path (>=55 dB round-trip, tests)
    c_lat = cfg.latent_channels
    params = init_revresnet(jax.random.PRNGKey(0), cfg)
    fast = rf.pack_revresnet(params, cfg, dtype=dtype)

    rng = np.random.default_rng(0)
    style = jnp.asarray(rng.uniform(size=(1, 512, 512, 3)), dtype)

    @jax.jit
    def factors(fast, style):
        zp = rf.encode_fast(fast, style, cfg, packed_latent=True)
        return cwct.style_factors_packed(zp, c_lat)

    ITERS = 16

    @jax.jit
    def stylize_chain(fast, frames, ls, mu_s):
        """ITERS stylize round trips INSIDE one compiled program
        (lax.fori_loop): one host dispatch regardless of iteration count,
        so per-dispatch RPC latency (measured up to ~1 s/dispatch on a
        congested relay day — it does NOT pipeline) cannot contaminate the
        throughput number. The carried frames change every iteration, so
        nothing folds away."""
        def body(_, x):
            zp = rf.encode_fast(fast, x, cfg, packed_latent=True)
            z_cs = cwct.transfer_with_factors_packed(zp, ls, mu_s, c_lat)
            out = rf.decode_fast(fast, z_cs, cfg, packed_latent=True)
            return jnp.clip(out, 0.0, 1.0).astype(x.dtype)

        return jax.lax.fori_loop(0, ITERS, body, frames)

    ls, mu_s = factors(fast, style)

    # Honest timing: on the axon relay, block_until_ready acks before real
    # execution; fence with a host readback (vstnet_tpu/runtime/timing.py).
    best = 0.0
    best_batch = 0
    for batch in (128, 256):  # sweep knees measured in PERF.md
        frames = jnp.asarray(
            rng.uniform(size=(batch, 512, 512, 3)), dtype)
        out = stylize_chain(fast, frames, ls, mu_s)
        _ = np.asarray(out[0, 0, :4, 0])  # compile + warm + fence
        ready.set()  # device round trip proven; disarm the init watchdog

        t0 = time.perf_counter()
        x = stylize_chain(fast, frames, ls, mu_s)
        _ = np.asarray(x[0, 0, :4, 0])
        dt = time.perf_counter() - t0
        fps = batch * ITERS / dt
        if fps > best:
            best, best_batch = fps, batch

    record = {
        "metric": "stylized_512px_frames_per_sec_per_chip",
        "value": round(best, 2),
        "unit": "frames/sec",
        "vs_baseline": round(best / 5.0, 2),
        "detail": {"batch": best_batch, "dtype": "bfloat16",
                   "pipeline": "kernel-resident bf16 network (fused flat "
                               "Pallas blocks + in-kernel-unshuffle "
                               "transitions + fused stage3/reduction), "
                               "packed-latent cWCT; batch-flat B16-B256"},
    }
    print(json.dumps(record))
    try:  # session-local record: the outage fallback's "last_measured"
        with open(_LOCAL_RECORD, "w") as f:
            json.dump(record, f)
    except OSError:
        pass


def _main_guarded():
    """The init watchdog covers a HANGING relay; a CRASHED relay instead
    raises (observed: FAILED_PRECONDITION TPU backend error on every op
    after a mid-run relay failure, round 5). Either way the driver
    contract is one JSON line — report an honest zero with the error."""
    try:
        main()
    except Exception as e:  # backend/runtime failure, not a code bug
        print(json.dumps({
            "metric": "stylized_512px_frames_per_sec_per_chip",
            "value": 0.0,
            "unit": "frames/sec",
            "vs_baseline": 0.0,
            "detail": {
                "error": f"{type(e).__name__}: {str(e)[:200]}",
                "last_measured": _last_measured(),
            },
        }), flush=True)


if __name__ == "__main__":
    _main_guarded()
