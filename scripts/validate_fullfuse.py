"""Hardware parity gate for the bf16 full-fused route (stage3 +
reduction through the flat Pallas kernels, FUSE_MAX_CHANNELS=256):
stylize output A/B vs the stage3-on-XLA route, and the exact-inversion
check through the fused stage3/reduction kernels.

The c=256 split-ky conv path only lowers on real TPU Mosaic (CPU tests
run interpret mode), so this script is the gate for the
FUSE_MAX_CHANNELS default. f32 deliberately keeps the round-4 routing
(stage3 on XLA HIGHEST convs): its c=256 kernel working set overflows
the 16 MB scoped VMEM limit (measured: 16.87 MB at 512²) and f32 is the
fidelity tier, not the fast path — this script asserts that gate.

Usage: python scripts/validate_fullfuse.py
"""

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


def run_stylize(fast, x, style, cfg):
    c_lat = cfg.latent_channels
    zs = rf.encode_fast(fast, style, cfg, packed_latent=True)
    ls, mu_s = cwct.style_factors_packed(zs, c_lat)
    zp = rf.encode_fast(fast, x, cfg, packed_latent=True)
    z_cs = cwct.transfer_with_factors_packed(zp, ls, mu_s, c_lat)
    out = rf.decode_fast(fast, z_cs, cfg, packed_latent=True)
    return zp, out


def main():
    cfg = PHOTO_CONFIG
    rng = np.random.default_rng(0)
    params = init_revresnet(jax.random.PRNGKey(0), cfg)

    # f32 keeps the parity-gated round-4 routing regardless of the cap
    rf.FUSE_MAX_CHANNELS = 256
    f32_fast = rf.pack_revresnet(params, cfg, dtype=jnp.float32)
    assert all("raw" in bp and "packed" not in bp
               for bp in f32_fast["reduction"]), "f32 reduction must stay XLA"
    assert any("raw" in bp and "packed" not in bp and "packed_tr" not in bp
               for bp in f32_fast["stack"]), "f32 stage3 must stay XLA"
    print("f32 routing gate OK (stage3/reduction on XLA)")

    dtype = jnp.bfloat16
    x = jnp.asarray(rng.uniform(size=(4, 512, 512, 3)), dtype)
    style = jnp.asarray(rng.uniform(size=(1, 512, 512, 3)), dtype)

    outs = {}
    for ch in (64, 256):
        # routing is decided at PACK time ("packed" in the block params)
        rf.FUSE_MAX_CHANNELS = ch
        fast = rf.pack_revresnet(params, cfg, dtype=dtype)
        z, out = jax.jit(
            lambda f, a, s: run_stylize(f, a, s, cfg))(fast, x, style)
        outs[ch] = (np.asarray(z, np.float32), np.asarray(out, np.float32))
    ez = float(np.abs(outs[256][0] - outs[64][0]).max())
    eo = float(np.abs(outs[256][1] - outs[64][1]).max())
    print(f"[bf16] latent maxerr={ez:.3e} stylized maxerr={eo:.3e}")
    assert ez < 3e-2 and eo < 6e-2, "full-fuse stylize parity FAILED"

    # exact inversion through the fused stage3/reduction kernels —
    # sensitive to any kernel defect (decode must invert encode)
    zp = jax.jit(lambda f, a: rf.encode_fast(
        f, a, cfg, packed_latent=True))(fast, x)
    xr = jax.jit(lambda f, z: rf.decode_fast(
        f, z, cfg, packed_latent=True))(fast, zp)
    einv = float(np.abs(np.asarray(xr, np.float32)
                        - np.asarray(x, np.float32)).max())
    print(f"[bf16] inversion maxerr={einv:.3e}")
    assert einv < 5e-2, "full-fuse inversion FAILED"
    print("full-fuse parity OK")


if __name__ == "__main__":
    main()
