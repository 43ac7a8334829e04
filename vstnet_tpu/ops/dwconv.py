"""Fused 3x3 depthwise conv + bias + exact GELU for the SegFormer MixFFN.

The MixFFN (reference segment.py:26-41: fc1 -> 3x3 depthwise ->
GELU -> fc2) runs at the widest activations in the network (stage-1
tokens x 4C hidden); on the XLA path the depthwise conv and the GELU are
separate HBM round trips over that tensor (plus conv layout copies —
depthwise convs don't use the MXU at all, they are 9 shifted
multiply-adds). This kernel does dwconv + bias + GELU in ONE pass over
VMEM-resident rows: NHWC layout (C on lanes — the natural MixFFN layout,
hidden C is 256..2048, all lane multiples), grid over (batch, row
tiles), zero SAME padding reconstructed in-kernel (clip-window + shift
like the flat coupling kernels, torch zero-pad semantics).

GELU is the exact erf form (torch nn.GELU default) — Mosaic has no
erf lowering, so the kernel inlines the Eigen/XLA single-precision
rational approximation (|err| < 1e-6, far below bf16 resolution; the
kernel is routed on the bf16 half path, the strict-f32 parity path keeps
XLA).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Row-tile VMEM budget. Mosaic's scoped-stack accounting charges the
# PEAK of all live values — measured 23.94 MB for a whole-image 64x64x256
# tile (hardware compile error, round 5): ~24 B/element = x window (2) +
# zero-pad concat copy (2) + f32 acc (4) + f32 tap (4) + GELU f32
# temporaries (~8) + out (2). Budget 24 B/element against a 14 MB target
# (v5e scoped limit is 16 MB); verified on v5e.
VMEM_BUDGET = 14 * 1024 * 1024
BYTES_PER_ELEM = 24


def _erf_f32(x):
    """Eigen generic_fast_erf_float: rational erf for f32, |err|<1e-6."""
    x = jnp.clip(x, -4.0, 4.0)
    x2 = x * x
    a = jnp.float32(-2.72614225801306e-10)
    a = a * x2 + jnp.float32(2.77068142495902e-08)
    a = a * x2 + jnp.float32(-2.10102402082508e-06)
    a = a * x2 + jnp.float32(-5.69250639462346e-05)
    a = a * x2 + jnp.float32(-7.34990630326855e-04)
    a = a * x2 + jnp.float32(-2.95459980854025e-03)
    a = a * x2 + jnp.float32(-1.60960333262415e-02)
    b = jnp.float32(-1.45660718464996e-05)
    b = b * x2 + jnp.float32(-2.13374055278905e-04)
    b = b * x2 + jnp.float32(-1.68282697438203e-03)
    b = b * x2 + jnp.float32(-7.37332916720468e-03)
    b = b * x2 + jnp.float32(-1.42647390514189e-02)
    return x * a / b


def _gelu_exact(x):
    xf = x.astype(jnp.float32)
    inv_sqrt2 = jnp.float32(0.7071067811865476)
    return (jnp.float32(0.5) * xf * (1.0 + _erf_f32(xf * inv_sqrt2)))


def _dwconv_kernel(x_ref, w_ref, b_ref, o_ref, *, th, n_tiles,
                   single_tile):
    """One grid program: output rows [i*th, i*th+th). Multi-tile: x_ref
    is the clipped (th+2)-row halo window (clip displacement is exactly
    one row — realigned with a shift, torch zero rows masked in).
    Single-tile: x_ref is the whole image, zero rows concatenated."""
    i = pl.program_id(1)
    is_top = i == 0
    is_bottom = i == n_tiles - 1
    x = x_ref[0]                       # (t2 | hh, W, C)
    wgt = w_ref[...]                   # (3, 3, C)
    bias = b_ref[...]                  # (C,)

    if single_tile:
        zrow = jnp.zeros((1, *x.shape[1:]), x.dtype)
        x = jnp.concatenate([zrow, x, zrow], axis=0)   # (hh+2, W, C)
    else:
        t2 = th + 2

        def shift_fix(xx):
            down = jnp.concatenate([xx[-1:], xx[:-1]], 0)
            up = jnp.concatenate([xx[1:], xx[:1]], 0)
            return jnp.where(is_top, down, up)

        x = lax.cond(is_top | is_bottom, shift_fix, lambda xx: xx, x)
        # zero the out-of-image halo rows (torch zero padding)
        row = lax.broadcasted_iota(jnp.int32, x.shape, 0)
        x = jnp.where(
            (is_top & (row == 0)) | (is_bottom & (row == t2 - 1)),
            jnp.zeros_like(x), x)
    # zero column pad
    zcol = jnp.zeros((x.shape[0], 1, x.shape[2]), x.dtype)
    xp = jnp.concatenate([zcol, x, zcol], axis=1)  # (rows+?, W+2, C)

    wf = x.shape[1]
    acc = None
    for ky in range(3):
        for kx in range(3):
            tap = (xp[ky:ky + th, kx:kx + wf, :].astype(jnp.float32)
                   * wgt[ky, kx].astype(jnp.float32))
            acc = tap if acc is None else acc + tap
    acc = acc + bias.astype(jnp.float32)
    o_ref[0] = _gelu_exact(acc).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def dwconv3x3_bias_gelu(x, w, b, interpret: bool = False):
    """x (B, H, W, C) NHWC -> gelu(dwconv3x3_same(x) + b), one fused pass.

    w: (3, 3, C) depthwise taps (HWIO (3,3,1,C) also accepted),
    b: (C,). Matches reference MixFFN semantics (segment.py:26-41,270-282)
    with torch zero SAME padding and exact-erf GELU."""
    # pallas_call cannot lower on the CPU backend (tests, the multichip
    # dryrun child): interpret there — trace-time check, static per process
    interpret = interpret or jax.default_backend() == "cpu"
    bsz, hh, wf, c = x.shape
    if w.ndim == 4:  # HWIO depthwise (3, 3, 1, C)
        w = w.reshape(3, 3, c)
    # row tile: whole image when small, else ~VMEM-budgeted divisor
    budget_rows = max(VMEM_BUDGET // max(wf * c * BYTES_PER_ELEM, 1), 1)
    th = hh
    if hh > budget_rows:
        th = 1
        for cand in range(min(hh, budget_rows), 0, -1):
            if hh % cand == 0:
                th = cand
                break
    n_tiles = hh // th
    single_tile = n_tiles == 1
    t2 = hh if single_tile else th + 2
    el = pl.Element

    kernel = partial(_dwconv_kernel, th=th, n_tiles=n_tiles,
                     single_tile=single_tile)
    return pl.pallas_call(
        kernel,
        grid=(bsz, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (el(1), el(t2), el(wf), el(c)),
                lambda bb, ii: (bb, jnp.clip(ii * th - 1, 0,
                                             max(hh - t2, 0)), 0, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((el(1), el(th), el(wf), el(c)),
                               lambda bb, ii: (bb, ii * th, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, w, b)
