"""Fused stylize throughput at HD/FHD video frame shapes (BASELINE.json
config #5: frame-batched video at 1080p+). Chained-iters methodology of
bench.py (fori loop, readback fenced).

Usage: python scripts/bench_1080p.py [H W] [batches...]
e.g.   python scripts/bench_1080p.py 1080 1920 8 16
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


def main():
    args = [int(a) for a in sys.argv[1:]]
    h, w = (args[0], args[1]) if len(args) >= 2 else (1080, 1920)
    batches = args[2:] or [8, 16]
    cfg = PHOTO_CONFIG
    dtype = jnp.bfloat16
    c_lat = cfg.latent_channels
    params = init_revresnet(jax.random.PRNGKey(0), cfg)
    fast = rf.pack_revresnet(params, cfg, dtype=dtype)
    rng = np.random.default_rng(0)
    style = jnp.asarray(rng.uniform(size=(1, h, w, 3)), dtype)

    @jax.jit
    def factors(fast, style):
        zp = rf.encode_fast(fast, style, cfg, packed_latent=True)
        return cwct.style_factors_packed(zp, c_lat)

    ITERS = 8

    @jax.jit
    def stylize_chain(fast, frames, ls, mu_s):
        def body(_, x):
            zp = rf.encode_fast(fast, x, cfg, packed_latent=True)
            z_cs = cwct.transfer_with_factors_packed(zp, ls, mu_s, c_lat)
            out = rf.decode_fast(fast, z_cs, cfg, packed_latent=True)
            return jnp.clip(out, 0.0, 1.0).astype(x.dtype)

        return jax.lax.fori_loop(0, ITERS, body, frames)

    ls, mu_s = factors(fast, style)
    for batch in batches:
        try:
            frames = jnp.asarray(rng.uniform(size=(batch, h, w, 3)), dtype)
            out = stylize_chain(fast, frames, ls, mu_s)
            _ = np.asarray(out[0, 0, :4, 0])
            t0 = time.perf_counter()
            x = stylize_chain(fast, frames, ls, mu_s)
            _ = np.asarray(x[0, 0, :4, 0])
            dt = time.perf_counter() - t0
            fps = batch * ITERS / dt
            mpx = fps * h * w / 1e6
            print(f"{h}x{w} B={batch}: {fps:7.2f} fps "
                  f"({dt*1e3/(batch*ITERS):.2f} ms/frame, {mpx:.0f} Mpx/s)")
        except Exception as e:
            print(f"{h}x{w} B={batch}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}")


if __name__ == "__main__":
    main()
