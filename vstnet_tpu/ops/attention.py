"""Single-pass flash attention for SegFormer's spatial-reduction attention.

The XLA attention path (models/segformer.py:_attention) materializes the
(N, M) score matrix in f32 HBM — at 1024² inputs stage 1 is 65536x1024 x
4 B = 268 MB per block, traversed ~3x (scores write, softmax, probs
read). sr-attention's K/V side is tiny (M = N/sr² ≤ 4096 for every
shipped shape), so the whole K/V block fits VMEM and attention needs NO
online-softmax machinery: tile the query rows, compute the (TN, M) score
tile, softmax it in registers, and contract with V — scores never touch
HBM. Reference semantics: project/image_style/segment.py:44-84 (einsum →
softmax(f32) → einsum), reproduced with the same f32 accumulation and a
bf16 probs cast, matching the XLA path's dtype chain.

Memory-bound win only — the kernel reads q/k/v once and writes out once;
per-block HBM traffic at stage 1 drops ~268 MB -> ~17 MB.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Score-tile VMEM budget (f32 scores + exp temp, v5e ~16 MB/core).
_VMEM_SCORES = 8 * 1024 * 1024
# Largest K/V token count the kernel accepts (VMEM: M x D bf16 x 2 plus
# the score tile at the minimum TN). Every shipped segmenter shape has
# M <= 4096 (stage 4 of a 2048² input).
MAX_KV = 8192


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    q = q_ref[0]  # (TN, D) bf16
    k = k_ref[0]  # (M, D) bf16
    v = v_ref[0]  # (M, D) bf16
    s = lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (TN, M) f32, lives only in VMEM
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = lax.dot_general(
        p.astype(q.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


def pick_query_tile(n: int, m: int) -> int:
    """Rows of Q per grid step: bounded by the f32 score tile budget,
    16-sublane aligned (bf16)."""
    cap = max(_VMEM_SCORES // (m * 4 * 2), 16)
    return int(min(n, 512, cap)) // 16 * 16


@partial(jax.jit, static_argnames=("scale", "interpret"))
def sr_attention_flash(q, k, v, scale: float, interpret: bool = False):
    """q (G, N, D), k/v (G, M, D) -> (G, N, D), G = batch*heads.

    Rows of q beyond a TN multiple are zero-padded and sliced off (their
    softmax is over real keys — finite, discarded)."""
    # pallas_call cannot lower on the CPU backend (tests, the multichip
    # dryrun child): interpret there — trace-time check, static per process
    interpret = interpret or jax.default_backend() == "cpu"
    g, n, d = q.shape
    m = k.shape[1]
    th = pick_query_tile(n, m)
    n_pad = -n % th
    if n_pad:
        q = jnp.pad(q, ((0, 0), (0, n_pad), (0, 0)))
    nt = (n + n_pad) // th

    out = pl.pallas_call(
        partial(_attn_kernel, scale=scale),
        grid=(g, nt),
        in_specs=[
            pl.BlockSpec((1, th, d), lambda gi, i: (gi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda gi, i: (gi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda gi, i: (gi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, d), lambda gi, i: (gi, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(q, k, v)
    return out[:, :n] if n_pad else out


# Route the kernel only where the score matrix is the dominant traffic:
# measured @1024² (profile_segformer.py) stage 1 (N=65536) 5.5 -> 3.4 ms
# and stage 2 (N=16384) 6.3 -> 4.9 ms, but stage 3 (N=4096, 5 heads)
# regressed ~1 ms — its score matrix is modest and the per-head q/k/v
# transposes around the kernel cost more than they save.
MIN_Q = 8192


def flash_ok(n: int, m: int, dtype) -> bool:
    """Kernel applicability: bf16 activations (the f32 path keeps the XLA
    einsums for the parity gates), a K/V block that fits VMEM, and a
    query count large enough that killing the HBM score matrix pays for
    the head transposes (MIN_Q note above)."""
    return dtype == jnp.bfloat16 and m <= MAX_KV and n >= MIN_Q
