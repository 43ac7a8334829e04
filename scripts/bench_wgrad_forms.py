"""Find a fast formulation for the conv weight-gradient contraction
einsum('bchw,bohw->co') at training shapes (the measured 60-80 ms/conv
pathology — PERF.md). Candidates reshape/transpose so the 131k-pixel
contraction lands on the MXU like the (fast) cWCT covariance einsums.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from vstnet_tpu.runtime.timing import timeit_real

P = lax.Precision.HIGHEST


def run(name, fn, *args):
    try:
        dt = timeit_real(fn, *args, iters=5, chain=False)
        print(f"  {name:44s}: {dt * 1000:8.2f} ms", flush=True)
    except Exception as e:
        print(f"  {name:44s}: FAILED {type(e).__name__} {str(e)[:90]}",
              flush=True)


def main():
    rng = np.random.default_rng(0)
    b, c, o, h, w = 2, 16, 16, 256, 256
    x = jnp.asarray(rng.standard_normal((b, c, h, w)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((b, o, h, w)), jnp.float32)

    run("einsum bchw,bohw->co (XLA autodiff form)",
        jax.jit(lambda x, g: jnp.einsum("bchw,bohw->co", x, g,
                                        precision=P)), x, g)
    run("reshape (C,N)@(N,O) dot",
        jax.jit(lambda x, g: jnp.dot(
            x.transpose(1, 0, 2, 3).reshape(c, -1),
            g.transpose(1, 0, 2, 3).reshape(o, -1).T, precision=P)), x, g)
    run("einsum via NHWC bhwc,bhwo->co",
        jax.jit(lambda x, g: jnp.einsum(
            "bhwc,bhwo->co",
            x.transpose(0, 2, 3, 1), g.transpose(0, 2, 3, 1),
            precision=P)), x, g)
    run("dot_general contract b,h,w directly",
        jax.jit(lambda x, g: lax.dot_general(
            x, g, (((0, 2, 3), (0, 2, 3)), ((), ())), precision=P)), x, g)
    # the 9-tap version all at once: stack taps into K
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
    taps = jnp.stack([
        lax.slice(xp, (0, 0, r, cc), (b, c, r + h, cc + w))
        for r in range(3) for cc in range(3)], axis=1)  # (b, 9, c, h, w)
    run("9-tap stacked einsum bkchw,bohw->kco",
        jax.jit(lambda t, g: jnp.einsum("bkchw,bohw->kco", t, g,
                                        precision=P)), taps, g)

    # bf16 variants
    xb, gb = x.astype(jnp.bfloat16), g.astype(jnp.bfloat16)
    run("bf16 einsum bchw,bohw->co",
        jax.jit(lambda x, g: jnp.einsum(
            "bchw,bohw->co", x, g,
            preferred_element_type=jnp.float32)), xb, gb)
    run("bf16 reshape (C,N)@(N,O) dot",
        jax.jit(lambda x, g: jnp.dot(
            x.transpose(1, 0, 2, 3).reshape(c, -1),
            g.transpose(1, 0, 2, 3).reshape(o, -1).T,
            preferred_element_type=jnp.float32)), xb, gb)


if __name__ == "__main__":
    main()
