"""Microbench: per-block fused_coupling_flat loop vs fused_coupling_chain_flat.

Decides whether to wire the chain kernel into revresnet_fast's stage
routing. Stage shapes from the photo config at 512px:
  stage1: C=16, H=W=512, 10 stride-1 blocks
  stage2: C=64, H=W=256, 9 stride-1 blocks (after the stride-2 entry)

Usage: python scripts/bench_chain.py [batch]
"""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from vstnet_tpu.ops import coupling_flat as cf


def bench(label, fn, *args, iters=20):
    out = fn(*args)
    jax.tree.map(lambda a: np.asarray(a.reshape(-1)[:1]), out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree.map(lambda a: np.asarray(a.reshape(-1)[:1]), out)
    dt = (time.perf_counter() - t0) / iters
    print(f"  {label:42s}: {dt * 1000:8.2f} ms")
    return dt


def make_branch(key, c, mult=4):
    ks = jax.random.split(key, 6)
    mid = max(c // mult, 1)

    def conv(k, cin, cout):
        return {
            "w": jax.random.normal(k, (3, 3, cin, cout), jnp.float32) * 0.05,
            "b": jnp.zeros((cout,)),
        }

    return {
        "conv1": conv(ks[0], c, mid),
        "conv2": conv(ks[1], mid, mid),
        "conv3": conv(ks[2], mid, c),
    }


def run_stage(c, h, w, n_blocks, batch, dtype=jnp.bfloat16):
    print(f"stage C={c} {h}x{w} x{n_blocks} blocks, B={batch}, "
          f"{dtype.__name__}:")
    key = jax.random.PRNGKey(0)
    branches = [make_branch(k, c) for k in jax.random.split(key, n_blocks)]
    packed = [cf.pack_branch_weights_flat(b, dtype) for b in branches]

    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.standard_normal((batch, c, h, w)), dtype)
    x2 = jnp.asarray(rng.standard_normal((batch, c, h, w)), dtype)

    from vstnet_tpu.models.revresnet_fast import pick_tile
    th = pick_tile(h, c, w)

    @jax.jit
    def per_block(x1, x2):
        x1f = cf.nhwc_to_flat(jnp.transpose(x1, (0, 2, 3, 1)))
        x2f = cf.nhwc_to_flat(jnp.transpose(x2, (0, 2, 3, 1)))
        for p in packed:
            x1f, x2f = x2f, cf.fused_coupling_flat(x1f, x2f, p, h, w, th=th)
        return x1f, x2f

    base = bench(f"per-block loop (th={th})", per_block, x1, x2)

    for k in (2, 3, 5):
        if n_blocks % k:
            continue
        r = 3 * k
        for tch in (32, 64, 128):
            if h % tch or tch < r:
                continue
            chains = [
                cf.pack_chain_weights_flat(branches[i:i + k], dtype)
                for i in range(0, n_blocks, k)
            ]

            @jax.jit
            def chained(x1, x2, chains=chains, tch=tch, r=r):
                x1f = cf.nhwc_to_flat(
                    jnp.transpose(x1, (0, 2, 3, 1)), halo_rows=r)
                x2f = cf.nhwc_to_flat(
                    jnp.transpose(x2, (0, 2, 3, 1)), halo_rows=r)
                for ch in chains:
                    x1f, x2f = cf.fused_coupling_chain_flat(
                        x1f, x2f, ch, h, w, th=tch)
                return x1f, x2f

            try:
                dt = bench(f"chain k={k} th={tch}", chained, x1, x2)
                print(f"    -> {base / dt:.2f}x vs per-block")
            except Exception as e:
                print(f"  chain k={k} th={tch}: FAILED "
                      f"{type(e).__name__}: {str(e)[:100]}")


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    run_stage(16, 512, 512, 10, batch)
    run_stage(64, 256, 256, 9 + 1, batch)  # 10 so k=2/5 divide; ~stage2


if __name__ == "__main__":
    main()
