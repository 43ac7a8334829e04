"""A/B: stage-3 (256ch) coupling blocks — XLA conv path vs the fused flat
Pallas kernel.

Round-2 routed stage3 to XLA ("C fills the lane tiles"), but the round-3
roofline measured those convs at only 60-70% MXU efficiency PLUS the
conv-layout transposes counted under glue. At 256ch the fused kernel's
dot shapes are MXU-friendly (conv1 K=768 N=192, conv3 split-ky K=192
N=256 per tap) — re-measure whether fusing wins now that conv3 supports
split_ky and the no-pad entry exists.

Usage: python scripts/bench_stage3_fused.py [batch] [n_blocks]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from vstnet_tpu.models import revresnet_fast as rf
from vstnet_tpu.ops.coupling_flat import (
    fused_coupling_flat, pack_branch_weights_flat, row_stride)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n_blocks = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    c, h, w = 256, 128, 128  # stage3 shape at 512^2 input
    mid = c // 4
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    def mk_branch(key):
        ks = jax.random.split(key, 3)
        def conv(k, ci, co):
            return {"w": 0.1 * jax.random.normal(k, (3, 3, ci, co), jnp.float32),
                    "b": jnp.zeros((co,), jnp.float32)}
        return {"conv1": conv(ks[0], c, mid), "conv2": conv(ks[1], mid, mid),
                "conv3": conv(ks[2], mid, c)}

    branches = [mk_branch(k) for k in jax.random.split(jax.random.PRNGKey(0),
                                                       n_blocks)]
    packed = [jax.tree.map(lambda a: a.astype(dt),
                           pack_branch_weights_flat(bp)) for bp in branches]
    raw = [jax.tree.map(lambda a: a.astype(dt), bp) for bp in branches]

    x1 = jnp.asarray(rng.uniform(size=(batch, c, h, w)), dt)
    x2 = jnp.asarray(rng.uniform(size=(batch, c, h, w)), dt)

    nbytes = 2
    th_np = rf.pick_tile(h, c, w, dtype_bytes=nbytes, nopad=True)
    nopad = rf._nopad_ok(h, w, th_np)
    th = th_np if nopad else rf.pick_tile(h, c, w, dtype_bytes=nbytes)
    print(f"fused route: th={th} nopad={nopad}")

    @jax.jit
    def run_xla(x1, x2):
        def body(_, xs):
            a, b = xs
            for bp in raw:
                a, b = b, rf._branch_nchw(b, bp, 1) + a
            return a, b
        return lax.fori_loop(0, 4, body, (x1, x2))

    @jax.jit
    def run_fused(x1, x2):
        b_, cc = x1.shape[0], x1.shape[1]
        def body(_, xs):
            a, b = xs
            if nopad:
                af, bf = a.reshape(b_, cc, h * w), b.reshape(b_, cc, h * w)
            else:
                af, bf = rf._to_flat(a), rf._to_flat(b)
            for bp in packed:
                af, bf = bf, fused_coupling_flat(af, bf, bp, h, w, th=th,
                                                 padded=not nopad)
            if nopad:
                return af.reshape(b_, cc, h, w), bf.reshape(b_, cc, h, w)
            return rf._from_flat(af, h, w), rf._from_flat(bf, h, w)
        return lax.fori_loop(0, 4, body, (x1, x2))

    for name, fn in (("xla", run_xla), ("fused", run_fused)):
        try:
            o = fn(x1, x2)
            _ = np.asarray(o[0][0, 0, :2, 0])
            t0 = time.perf_counter()
            o = fn(x1, x2)
            _ = np.asarray(o[0][0, 0, :2, 0])
            dtm = time.perf_counter() - t0
            us_fb = dtm * 1e6 / (batch * 4 * n_blocks)
            print(f"{name:6s}: {dtm*1e3:8.1f} ms total  "
                  f"{us_fb:7.2f} us/frame/block")
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")

    # parity
    o1 = run_xla(x1, x2)
    o2 = run_fused(x1, x2)
    err = max(float(jnp.max(jnp.abs(o1[i].astype(jnp.float32)
                                    - o2[i].astype(jnp.float32))))
              for i in range(2))
    print(f"max |xla - fused| = {err:.3e}")


if __name__ == "__main__":
    main()
