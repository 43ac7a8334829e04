"""Batch sweep of the fused stylize path (bench.py's program) to find the
throughput knee. Run on the real chip: python scripts/bench_batch_sweep.py
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
    cfg = PHOTO_CONFIG
    dtype = jnp.bfloat16
    c_lat = cfg.latent_channels
    params = init_revresnet(jax.random.PRNGKey(0), cfg)
    fast = rf.pack_revresnet(params, cfg, dtype=dtype)
    rng = np.random.default_rng(0)
    style = jnp.asarray(rng.uniform(size=(1, 512, 512, 3)), dtype)

    @jax.jit
    def factors(fast, style):
        zp = rf.encode_fast(fast, style, cfg, packed_latent=True)
        return cwct.style_factors_packed(zp, c_lat)

    @jax.jit
    def stylize_frames(fast, frames, ls, mu_s):
        zp = rf.encode_fast(fast, frames, cfg, packed_latent=True)
        z_cs = cwct.transfer_with_factors_packed(zp, ls, mu_s, c_lat)
        return jnp.clip(
            rf.decode_fast(fast, z_cs, cfg, packed_latent=True), 0.0, 1.0)

    ls, mu_s = factors(fast, style)

    batches = [int(a) for a in sys.argv[1:]] or [64, 96, 128, 160, 192, 256]
    for batch in batches:
        try:
            frames = jnp.asarray(
                rng.uniform(size=(batch, 512, 512, 3)), dtype)
            out = stylize_frames(fast, frames, ls, mu_s)
            _ = np.asarray(out[0, 0, :4, 0])
            iters = 8
            t0 = time.perf_counter()
            x = frames
            for _ in range(iters):
                x = stylize_frames(fast, x, ls, mu_s)
            _ = np.asarray(x[0, 0, :4, 0])
            dt = time.perf_counter() - t0
            print(f"B={batch:4d}: {batch * iters / dt:8.2f} fps "
                  f"({dt / iters * 1000:7.1f} ms/iter)", flush=True)
        except Exception as e:
            print(f"B={batch:4d}: FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
