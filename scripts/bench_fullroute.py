"""Full-network route A/B: measure the bench chain fps under different
fused-routing constants (stage3/reduction fusion, transition batch cap).

Usage: python scripts/bench_fullroute.py FUSE_MAX_CH TR_MAX_BATCH BATCH...
e.g.   python scripts/bench_fullroute.py 256 1000000 128 256
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
    if len(sys.argv) < 3:
        print(__doc__.strip())
        sys.exit(2)
    rf.FUSE_MAX_CHANNELS = int(sys.argv[1])
    rf.TR_FUSE_MAX_BATCH = int(sys.argv[2])
    batches = [int(a) for a in sys.argv[3:]] or [256]
    print(f"route: FUSE_MAX_CHANNELS={rf.FUSE_MAX_CHANNELS} "
          f"TR_FUSE_MAX_BATCH={rf.TR_FUSE_MAX_BATCH}")

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
    for batch in batches:
        frames = jnp.asarray(rng.uniform(size=(batch, 512, 512, 3)), dtype)
        try:
            out = stylize_chain(fast, frames, ls, mu_s)
            _ = np.asarray(out[0, 0, :4, 0])
            t0 = time.perf_counter()
            x = stylize_chain(fast, frames, ls, mu_s)
            _ = np.asarray(x[0, 0, :4, 0])
            dt = time.perf_counter() - t0
            print(f"B={batch}: {batch * ITERS / dt:8.2f} fps  "
                  f"({dt*1e6/(batch*ITERS):.1f} us/frame)")
        except Exception as e:
            print(f"B={batch}: FAILED {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
