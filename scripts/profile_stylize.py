"""Device-trace breakdown of the fused 512px stylize (relay-latency-proof:
xplane device events record true TPU execution time regardless of RPC
overhead — the methodology that exposed the 56 ms-device / 5.5 s-wall
discrepancy in round 2, PERF.md).

Usage: python scripts/profile_stylize.py [batch] [logdir] [H W]
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vstnet_tpu.config import PHOTO_CONFIG
from vstnet_tpu.models import cwct
from vstnet_tpu.models import revresnet_fast as rf
from vstnet_tpu.models.revresnet import init_revresnet


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    logdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/prof_stylize"
    h, w = ((int(sys.argv[3]), int(sys.argv[4]))
            if len(sys.argv) > 4 else (512, 512))
    cfg = PHOTO_CONFIG
    dt = jnp.bfloat16
    c_lat = cfg.latent_channels
    params = init_revresnet(jax.random.PRNGKey(0), cfg)
    fast = rf.pack_revresnet(params, cfg, dtype=dt)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.uniform(size=(batch, h, w, 3)), dt)

    zp1 = rf.encode_fast(fast, frames[:1], cfg, packed_latent=True)
    ls, mu = cwct.style_factors_packed(zp1, c_lat)

    @jax.jit
    def full(x):
        z = rf.encode_fast(fast, x, cfg, packed_latent=True)
        z = cwct.transfer_with_factors_packed(z, ls, mu, c_lat)
        return jnp.clip(rf.decode_fast(fast, z, cfg, packed_latent=True),
                        0, 1).astype(dt)

    x = full(frames)
    _ = np.asarray(x[0, 0, :2, 0])

    n_iters = 4
    with jax.profiler.trace(logdir):
        for _ in range(n_iters):
            x = full(x)
        _ = np.asarray(x[0, 0, :2, 0])

    xplanes = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                        recursive=True)
    for f in xplanes:
        summarize(f, batch, n_iters)


def summarize(path, batch, n_iters, top=30):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as fh:
        xs.ParseFromString(fh.read())
    for p in xs.planes:
        n_events = sum(len(ln.events) for ln in p.lines)
        if not n_events or "TPU" not in p.name:
            continue
        md = {k: v.name for k, v in p.event_metadata.items()}
        print(f"plane {p.name}: {n_events} events; per-line totals:")
        for ln in p.lines:
            t = sum(e.duration_ps for e in ln.events) / 1e9
            if t > 0.1:
                print(f"  line '{ln.name}': {t:.2f} ms")
        # Sync compute timeline only ('XLA Ops'; async copy-starts overlap
        # compute and their durations include wait time)
        for ln in p.lines:
            if ln.name != "XLA Ops":
                continue
            agg = {}
            for e in ln.events:
                name = md.get(e.metadata_id, str(e.metadata_id))
                key = name.split(" = ")[0]
                # collapse fusion instances: strip trailing .N digits
                key = key.rstrip("0123456789").rstrip(".")
                agg[key] = agg.get(key, 0) + e.duration_ps
            tot = sum(agg.values())
            print(f"XLA Ops line total {tot/1e9:.2f} ms "
                  f"({tot/1e6/(batch*n_iters):.1f} us/frame); top groups:")
            for name, ps in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
                us_frame = ps / 1e6 / (batch * n_iters)
                print(f"  {ps/1e9:9.2f} ms  {us_frame:8.2f} us/frame  "
                      f"{name[:90]}")


if __name__ == "__main__":
    main()
