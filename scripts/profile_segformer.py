"""Device-trace breakdown of SegFormer-B4 segment_logits.

Usage: python scripts/profile_segformer.py [size] [batch] [half]
Prints the top HLO ops by total device time (xplane methodology — see
profile_stylize.py; immune to relay RPC latency) and the per-image total.
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vstnet_tpu.models.segformer import init_segformer, segment_logits


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    half = len(sys.argv) > 3 and sys.argv[3] == "half"
    logdir = f"/tmp/prof_segformer_{size}_{batch}{'_half' if half else ''}"
    import shutil

    shutil.rmtree(logdir, ignore_errors=True)

    params = init_segformer(jax.random.PRNGKey(1))
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(batch, size, size, 3)), jnp.float32)

    out = segment_logits(params, img, half=half)
    _ = np.asarray(out[0, 0, :2, 0])

    n_iters = 3
    with jax.profiler.trace(logdir):
        for _ in range(n_iters):
            out = segment_logits(params, img, half=half)
        _ = np.asarray(out[0, 0, :2, 0])

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    for f in glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                       recursive=True):
        xs = xplane_pb2.XSpace()
        with open(f, "rb") as fh:
            xs.ParseFromString(fh.read())
        for p in xs.planes:
            if "TPU" not in p.name:
                continue
            for ln in p.lines:
                if ln.name != "XLA Ops":
                    continue
                agg = {}
                for e in ln.events:
                    name = p.event_metadata[e.metadata_id].name
                    agg[name] = agg.get(name, 0) + e.duration_ps
                tot = sum(agg.values()) / 1e12
                per = tot / (batch * n_iters)
                print(f"segment_logits: {per*1e3:.2f} ms/image "
                      f"device-side (B={batch} @{size}²"
                      f"{', bf16' if half else ''})")
                for name, ps in sorted(agg.items(), key=lambda kv: -kv[1])[:25]:
                    ms = ps / 1e9 / (batch * n_iters)
                    print(f"  {ms:8.3f} ms  {name}")


if __name__ == "__main__":
    main()
