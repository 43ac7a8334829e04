"""Localize the slow backward: single coupling-block and single-conv
fwd+bwd timings at training shapes (b2, 256^2, f32), plus whole-encode
fwd+bwd with remat. Variants: dot-einsum NCHW, lax.conv NCHW, lax.conv
NHWC, and bf16.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vstnet_tpu.config import PHOTO_CONFIG
from vstnet_tpu.models.revresnet import encode, init_revresnet
from vstnet_tpu.ops import pad_conv as pc
from vstnet_tpu.runtime.timing import timeit_real


def run(name, fn, *args):
    try:
        dt = timeit_real(fn, *args, iters=3, chain=False)
        print(f"  {name:48s}: {dt * 1000:8.1f} ms", flush=True)
    except Exception as e:
        print(f"  {name:48s}: FAILED {type(e).__name__} {str(e)[:90]}",
              flush=True)


def main():
    rng = np.random.default_rng(0)
    cfg = PHOTO_CONFIG.with_remat()
    params = init_revresnet(jax.random.PRNGKey(0), cfg)
    a = jnp.asarray(rng.uniform(size=(2, 256, 256, 3)), jnp.float32)

    x = jnp.asarray(rng.standard_normal((2, 16, 256, 256)) * 0.3,
                    jnp.float32)
    br = params["stack"][0]  # 16->4->4->16 branch

    def branch_dot(x, br):
        return pc.residual_branch_nchw(x, br)

    def branch_conv_nchw(x, br):
        h = pc.conv2d_nchw(pc.reflect_pad_2d_nchw(x, 1),
                           br["conv1"]["w"], br["conv1"]["b"])
        h = jax.nn.relu(h)
        h = pc.conv2d_nchw(pc.reflect_pad_2d_nchw(h, 1),
                           br["conv2"]["w"], br["conv2"]["b"])
        h = jax.nn.relu(h)
        return pc.conv2d_nchw(pc.reflect_pad_2d_nchw(h, 1),
                              br["conv3"]["w"], br["conv3"]["b"])

    def branch_conv_nhwc(xn, br):
        return pc.residual_branch(xn, br)

    for name, fn, xx in [
        ("branch fwd dot-nchw", branch_dot, x),
        ("branch fwd conv-nchw", branch_conv_nchw, x),
        ("branch fwd conv-nhwc", branch_conv_nhwc,
         jnp.transpose(x, (0, 2, 3, 1))),
    ]:
        f = jax.jit(lambda p, xx, fn=fn: jnp.sum(fn(xx, p)))
        g = jax.jit(jax.grad(
            lambda p, xx, fn=fn: jnp.sum(jnp.square(fn(xx, p)))))
        run(name, f, br, xx)
        run(name.replace("fwd", "fwd+bwd(w)"), g, br, xx)
        gx = jax.jit(jax.grad(
            lambda xx, p, fn=fn: jnp.sum(jnp.square(fn(xx, p)))))
        run(name.replace("fwd", "fwd+bwd(x)"), gx, xx, br)

    # bf16 variant of the dot branch
    xb = x.astype(jnp.bfloat16)
    brb = jax.tree.map(lambda t: t.astype(jnp.bfloat16), br)
    run("branch fwd+bwd(w) dot-nchw bf16", jax.jit(jax.grad(
        lambda p, xx: jnp.sum(jnp.square(
            pc.residual_branch_nchw(xx, p)).astype(jnp.float32)))), brb, xb)

    # whole encode fwd+bwd, remat on
    run("encode fwd (remat cfg)", jax.jit(
        lambda p, x: jnp.sum(encode(p, x, cfg))), params, a)
    run("encode fwd+bwd (remat on)", jax.jit(jax.grad(
        lambda p, x: jnp.sum(jnp.square(encode(p, x, cfg))))), params, a)


if __name__ == "__main__":
    main()
