"""Hardware validation for the fused MixFFN dwconv+bias+GELU kernel
(ops/dwconv.py): Mosaic compile + parity vs the XLA chain on the real
chip, then bf16 segmenter timing @1024² with the kernel on vs off.

Usage: python scripts/validate_dwconv.py [--quick]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    quick = "--quick" in sys.argv
    seg_only = "--seg_only" in sys.argv
    from vstnet_tpu.ops.dwconv import dwconv3x3_bias_gelu

    rng = np.random.default_rng(0)

    # ---- kernel parity vs XLA on a MixFFN-shaped tensor ----
    for (b, h, w, c) in ([] if seg_only else [(1, 64, 64, 256), (1, 128, 128, 256),
                         (2, 32, 32, 1280)]):
        x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.bfloat16)
        wdw = jnp.asarray(rng.standard_normal((3, 3, c)) * 0.1, jnp.bfloat16)
        bias = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.bfloat16)

        got = jax.jit(dwconv3x3_bias_gelu)(x, wdw, bias)
        got = np.asarray(got, np.float32)

        @jax.jit
        def ref_chain(x, wdw, bias):
            xf = x.astype(jnp.float32)
            wf = wdw.astype(jnp.float32).reshape(3, 3, 1, c)
            y = jax.lax.conv_general_dilated(
                xf, wf, (1, 1), "SAME", feature_group_count=c,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = y + bias.astype(jnp.float32)
            return jax.nn.gelu(y, approximate=False)

        ref = np.asarray(ref_chain(x, wdw, bias))
        err = np.abs(got - ref).max()
        print(f"dwconv parity b={b} h={h} w={w} c={c}: maxerr={err:.3e}")
        assert err < 5e-2, "dwconv kernel parity FAILED on hardware"
    if not seg_only:
        print("kernel parity OK")
    if quick:
        return

    # ---- segmenter timing @1024², kernel on vs off ----
    from vstnet_tpu.models import segformer as sf

    params = sf.init_segformer(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.uniform(size=(1, 1024, 1024, 3)), jnp.float32)

    ITERS = 8

    for fuse in (False, True):
        sf._DW_FUSE = fuse

        @jax.jit
        def run(params, x):
            def body(i, acc):
                # perturb per iteration so XLA cannot hoist the
                # loop-invariant segmenter out of the fori_loop
                xi = x + i.astype(jnp.float32) * 1e-9
                logits = sf.segment_logits(params, xi, half=True)
                return acc + logits[..., 0].mean()

            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

        out = run(params, x)
        _ = float(out)
        t0 = time.perf_counter()
        out = run(params, x)
        _ = float(out)
        dt = (time.perf_counter() - t0) / ITERS * 1000
        print(f"DW_FUSE={int(fuse)}: segmenter bf16 @1024²: {dt:.1f} ms")


if __name__ == "__main__":
    main()
