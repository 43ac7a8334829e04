"""Capture a jax.profiler trace of encode fwd+bwd (the ~5.5 s program)
and dump the top self-time ops via tensorboard_plugin_profile.

Usage: python scripts/profile_bwd.py [logdir]
"""

import glob
import gzip
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vstnet_tpu.config import PHOTO_CONFIG
from vstnet_tpu.models.revresnet import encode, init_revresnet


def main():
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof_bwd"
    cfg = PHOTO_CONFIG.with_remat()
    params = init_revresnet(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(size=(2, 256, 256, 3)), jnp.float32)

    f = jax.jit(jax.grad(
        lambda p, x: jnp.sum(jnp.square(encode(p, x, cfg)))))
    out = f(params, a)  # compile + warm
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]

    with jax.profiler.trace(logdir):
        for _ in range(2):
            out = f(params, a)
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]

    print("trace done", flush=True)
    xplanes = glob.glob(
        os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    print("xplanes:", xplanes, flush=True)
    for f in xplanes:
        summarize_xplane(f)


def summarize_xplane(path, top: int = 25):
    """Aggregate device-plane event durations by op name. (The
    tensorboard_plugin_profile converter is API-incompatible with this
    image's TF; the xplane proto parse below is what found the
    56 ms-device vs 5.5 s-wall relay discrepancy — PERF.md.)"""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as fh:
        xs.ParseFromString(fh.read())
    for p in xs.planes:
        n_events = sum(len(ln.events) for ln in p.lines)
        if not n_events or "TPU" not in p.name:
            continue
        print(f"plane {p.name}: {n_events} events")
        md = {k: v.name for k, v in p.event_metadata.items()}
        agg = {}
        for ln in p.lines:
            for e in ln.events:
                name = md.get(e.metadata_id, str(e.metadata_id))
                agg[name] = agg.get(name, 0) + e.duration_ps
        for name, ps in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
            print(f"  {ps / 1e9:10.3f} ms  {name[:100]}")


if __name__ == "__main__":
    main()
