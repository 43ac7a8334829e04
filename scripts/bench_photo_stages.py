"""Per-stage breakdown of the full photo pipeline at 1024^2 (B=1).

Explains photo_pipeline_bench's number and guides routing decisions.
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
from vstnet_tpu.models.revresnet import decode, encode, init_revresnet
from vstnet_tpu.ops.color import lab2rgb, rgb2lab
from vstnet_tpu.runtime.timing import timeit_real

SIZE = 1024
cfg = PHOTO_CONFIG
params = init_revresnet(jax.random.PRNGKey(0), cfg)
rng = np.random.default_rng(0)
c = jnp.asarray(rng.uniform(size=(1, SIZE, SIZE, 3)), jnp.float32)

enc = jax.jit(lambda p, x: encode(p, x, cfg))
dec = jax.jit(lambda p, z: decode(p, z, cfg))
z = enc(params, c)
cm = jnp.asarray(rng.integers(0, 20, size=(1, SIZE, SIZE)), jnp.int32)

tm = jax.jit(lambda zc, zs, m: cwct.transfer_masked(
    zc, zs, m, m, max_labels=64))
tg = jax.jit(cwct.transfer)

rows = [
    ("encode f32 HIGHEST", enc, params, c),
    ("decode f32 HIGHEST", dec, params, z),
    ("cwct masked K=64", tm, z, z, cm),
    ("cwct global", tg, z, z),
    ("rgb2lab+lab2rgb", jax.jit(lambda x: lab2rgb(rgb2lab(x))), c),
]
for name, fn, *args in rows:
    dt = timeit_real(fn, *args, iters=5, chain=False)
    print(f"  {name:24s}: {dt * 1000:8.1f} ms")

# fast-path variants (bf16)
fast = rf.pack_revresnet(params, cfg, dtype=jnp.bfloat16)
cb = c.astype(jnp.bfloat16)
encf = jax.jit(lambda f, x: rf.encode_fast(f, x, cfg))
decf = jax.jit(lambda f, z: rf.decode_fast(f, z, cfg))
zb = encf(fast, cb)
for name, fn, *args in [
    ("encode fast bf16", encf, fast, cb),
    ("decode fast bf16", decf, fast, zb),
    ("cwct masked K=64 bf16", tm, zb, zb, cm),
]:
    dt = timeit_real(fn, *args, iters=5, chain=False)
    print(f"  {name:24s}: {dt * 1000:8.1f} ms")
