"""Hardware validation for the full-res-boundary fused transition
(VSTNET_TR_FULL): parity vs the shipped route on the real chip, then a
batch-sweep fps A/B.

The kernel's in-VMEM (un)shuffle runs as MXU permutation-matrix dots
(Mosaic rejects strided lane loads on long flat memrefs), which only
exercise the real lowering on TPU — CPU tests run interpret mode — so
this script is the gate for the TR_FULL default. Usage:

    python scripts/validate_tr_full.py [BATCH...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vstnet_tpu.config import PHOTO_CONFIG
from vstnet_tpu.models import cwct
from vstnet_tpu.models import revresnet_fast as rf
from vstnet_tpu.models.revresnet import init_revresnet


def run_roundtrip(fast, x, cfg):
    zp = rf.encode_fast(fast, x, cfg, packed_latent=True)
    out = rf.decode_fast(fast, zp, cfg, packed_latent=True)
    return zp, out


def main():
    perf_only = "--perf_only" in sys.argv
    batches = [int(a) for a in sys.argv[1:] if not a.startswith("--")] or [
        16, 64, 128, 256]
    cfg = PHOTO_CONFIG
    rng = np.random.default_rng(0)
    params = init_revresnet(jax.random.PRNGKey(0), cfg)

    # ---- parity (f32, strict; then bf16 sanity) ----
    for dtype, tol in (() if perf_only else
                       ((jnp.float32, 5e-5), (jnp.bfloat16, 3e-2))):
        fast = rf.pack_revresnet(params, cfg, dtype=dtype)
        x = jnp.asarray(rng.uniform(size=(4, 512, 512, 3)), dtype)
        rf.TR_FULL_FUSE = False
        z_ref, out_ref = jax.jit(
            lambda f, a: run_roundtrip(f, a, cfg))(fast, x)
        z_ref, out_ref = np.asarray(z_ref, np.float32), np.asarray(
            out_ref, np.float32)
        rf.TR_FULL_FUSE = True
        z_new, out_new = jax.jit(
            lambda f, a: run_roundtrip(f, a, cfg))(fast, x)
        z_new, out_new = np.asarray(z_new, np.float32), np.asarray(
            out_new, np.float32)
        ez = float(np.abs(z_new - z_ref).max())
        eo = float(np.abs(out_new - out_ref).max())
        einv = float(np.abs(out_new - np.asarray(x, np.float32)).max())
        print(f"[{np.dtype(dtype).name if dtype != jnp.bfloat16 else 'bf16'}]"
              f" latent maxerr={ez:.3e} output maxerr={eo:.3e}"
              f" inversion maxerr={einv:.3e}")
        assert ez < tol and eo < tol, "TR_FULL parity FAILED"
    print("parity OK")

    # ---- perf A/B ----
    dtype = jnp.bfloat16
    c_lat = cfg.latent_channels
    fast = rf.pack_revresnet(params, cfg, dtype=dtype)
    style = jnp.asarray(rng.uniform(size=(1, 512, 512, 3)), dtype)

    @jax.jit
    def factors(fast, style):
        zp = rf.encode_fast(fast, style, cfg, packed_latent=True)
        return cwct.style_factors_packed(zp, c_lat)

    ITERS = 16

    @jax.jit
    def stylize_chain(fast, frames, ls, mu_s):
        def body(_, x):
            zp = rf.encode_fast(fast, x, cfg, packed_latent=True)
            z_cs = cwct.transfer_with_factors_packed(zp, ls, mu_s, c_lat)
            out = rf.decode_fast(fast, z_cs, cfg, packed_latent=True)
            return jnp.clip(out, 0.0, 1.0).astype(x.dtype)

        return jax.lax.fori_loop(0, ITERS, body, frames)

    ls, mu_s = factors(fast, style)
    for full in (False, True):
        rf.TR_FULL_FUSE = full
        # fresh jit per flag: TR_FULL_FUSE is read at trace time, and a
        # shared jit would silently reuse the first flag's executables
        stylize_chain = jax.jit(stylize_chain.__wrapped__)
        for batch in batches:
            frames = jnp.asarray(
                rng.uniform(size=(batch, 512, 512, 3)), dtype)
            # host-readback fence: block_until_ready LIES on the axon
            # relay (PERF.md) — feed the output back as the next input so
            # iterations chain, and read one element back per rep
            out = stylize_chain(fast, frames, ls, mu_s)
            _ = np.asarray(out[0, 0, 0])
            reps = max(2, 512 // (ITERS * batch))
            t0 = time.perf_counter()
            x = out
            for _ in range(reps):
                x = stylize_chain(fast, x, ls, mu_s)
            _ = np.asarray(x[0, 0, 0])
            dt = time.perf_counter() - t0
            fps = reps * ITERS * batch / dt
            print(f"TR_FULL={int(full)} B={batch:4d}: {fps:8.1f} fps/chip")


if __name__ == "__main__":
    main()
