"""Round-3 kernel-headroom investigation (VERDICT Weak #1/#8).

Breaks the 512px fused stylize into stages and the stage-1 coupling block
into its cost components, all timed with chained iterations + host-readback
fence (the relay acks block_until_ready early — runtime/timing.py).

Usage: python scripts/bench_fast_breakdown.py [batch]
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
from vstnet_tpu.ops import coupling_flat as cf


def fence(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


def timeit(fn, x, iters=8, chain=True):
    """fn must map x -> y of the same structure when chain=True."""
    y = fn(x)
    fence(y)
    t0 = time.perf_counter()
    cur = x
    for _ in range(iters):
        cur = fn(cur) if chain else fn(x)
    fence(cur)
    return (time.perf_counter() - t0) / iters


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    cfg = PHOTO_CONFIG
    dt = jnp.bfloat16
    c_lat = cfg.latent_channels
    params = init_revresnet(jax.random.PRNGKey(0), cfg)
    fast = rf.pack_revresnet(params, cfg, dtype=dt)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.uniform(size=(batch, 512, 512, 3)), dt)

    # ---- stage breakdown --------------------------------------------------
    enc = jax.jit(lambda x: rf.encode_fast(fast, x, cfg, packed_latent=True))
    zp = enc(frames)
    style_zp = enc(frames[:1])
    ls, mu = jax.jit(lambda z: cwct.style_factors_packed(z, c_lat))(style_zp)
    trans = jax.jit(
        lambda z: cwct.transfer_with_factors_packed(z, ls, mu, c_lat))
    dec = jax.jit(
        lambda z: rf.decode_fast(fast, z, cfg, packed_latent=True))
    full = jax.jit(lambda x: jnp.clip(
        rf.decode_fast(fast, cwct.transfer_with_factors_packed(
            rf.encode_fast(fast, x, cfg, packed_latent=True), ls, mu, c_lat),
            cfg, packed_latent=True), 0, 1).astype(dt))

    t_full = timeit(full, frames)
    print(f"B={batch} full stylize: {t_full*1e3:.1f} ms "
          f"= {batch/t_full:.1f} fps")
    # encode: x -> zp shapes differ; time unchained via fresh dispatch
    t_enc = timeit(enc, frames, chain=False)
    t_tr = timeit(trans, zp, chain=True)
    t_dec_zp = timeit(lambda z: enc(dec(z)), zp, chain=True)  # dec+enc pair
    print(f"  encode_fast:  {t_enc*1e3:.1f} ms ({t_enc/batch*1e6:.0f} us/frame)")
    print(f"  cwct packed:  {t_tr*1e3:.1f} ms")
    print(f"  dec+enc pair: {t_dec_zp*1e3:.1f} ms (subtract enc for dec)")

    # ---- stage-1 coupling block components -------------------------------
    h = w = 512
    cch = 16
    x1 = jnp.asarray(rng.standard_normal((batch, cch, cf.flat_len(h, w))),
                     dt)
    x2 = jnp.asarray(rng.standard_normal(x1.shape), dt)
    branch = {
        f"conv{i}": {
            "w": jnp.asarray(rng.standard_normal(
                (3, 3, cin, cout)) * 0.1, jnp.float32),
            "b": jnp.zeros((cout,), jnp.float32),
        }
        for i, (cin, cout) in enumerate([(cch, 4), (4, 4), (4, cch)], 1)
    }
    packed = cf.pack_branch_weights_flat(branch, dtype=dt)
    th = rf.pick_tile(h, cch, w)
    print(f"stage1 block th={th}")

    blk = jax.jit(lambda a, b: cf.fused_coupling_flat(a, b, packed, h, w,
                                                      th=th))
    t_blk = timeit(lambda p: (p[1], blk(p[0], p[1])), (x1, x2))
    print(f"  v3 coupling block: {t_blk/batch*1e6:.1f} us/frame/block")

    # memory floor: pure copy of the same bytes
    copy = jax.jit(lambda a, b: (a + b).astype(a.dtype))
    t_cp = timeit(lambda p: (p[1], copy(p[0], p[1])), (x1, x2))
    print(f"  stream add floor:  {t_cp/batch*1e6:.1f} us/frame")

    # dot-only: one stacked dot per conv shape, no taps/reflects/stack
    s = cf.row_stride(w)
    l_lanes = x1.shape[2]
    xs3 = jnp.asarray(rng.standard_normal((batch, 3 * cch, l_lanes)), dt)
    w1 = packed["w1"]

    @jax.jit
    def dots_only(xs):
        p = jax.vmap(lambda xx: jax.lax.dot_general(
            w1, xx, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))(xs)
        return xs, p[:, :, : l_lanes - 2 * s].astype(dt)

    t_dot = timeit(lambda p: dots_only(p[0]), (xs3, None), chain=False)
    print(f"  conv1 dot alone:   {t_dot/batch*1e6:.1f} us/frame")

    # shift-stack alone (2 shifted copies + selects)
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, l_lanes), 1) % s

    @jax.jit
    def stack_only(x):
        from vstnet_tpu.ops.coupling_flat import _shift_stack

        out = jax.vmap(
            lambda xx: _shift_stack(xx, pos, w, cf.col_offset(w)))(x[0])
        return x, out.astype(dt)

    t_st = timeit(lambda p: stack_only(p), (x2,), chain=False)
    print(f"  shift stack alone: {t_st/batch*1e6:.1f} us/frame")


if __name__ == "__main__":
    main()
