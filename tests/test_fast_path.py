"""Fast-path (fused Pallas CW) parity vs the standard path.

On CPU the kernels run in interpret mode via the pallas interpret flag
being implied... actually pallas_call on CPU backend requires
interpret=True; these tests monkeypatch the fused call accordingly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vstnet_tpu.ops.coupling_flat as cflat
import vstnet_tpu.models.revresnet_fast as rf
from vstnet_tpu.config import RevResNetConfig
from vstnet_tpu.models.revresnet import decode, encode, init_revresnet

SMALL = RevResNetConfig(n_blocks=(2, 2, 2), hidden_dim=16, sp_steps=2)


@pytest.fixture(autouse=True)
def _interpret_pallas(monkeypatch):
    from tests.conftest import patch_interpret_fused

    patch_interpret_fused(monkeypatch)
    yield


@pytest.mark.parametrize("w", [48, 128])
def test_encode_fast_parity(rng, w):
    params = init_revresnet(jax.random.PRNGKey(0), SMALL)
    fast = rf.pack_revresnet(params, SMALL)
    x = jnp.asarray(rng.uniform(size=(1, 32, w, 3)), jnp.float32)
    z_ref = encode(params, x, SMALL)
    z_fast = rf.encode_fast(fast, x, SMALL)
    np.testing.assert_allclose(
        np.asarray(z_fast), np.asarray(z_ref), atol=1e-5)


def test_decode_fast_parity(rng):
    params = init_revresnet(jax.random.PRNGKey(1), SMALL)
    fast = rf.pack_revresnet(params, SMALL)
    z = jnp.asarray(rng.standard_normal((1, 32, 48, 32)) * 0.1, jnp.float32)
    x_ref = decode(params, z, SMALL)
    x_fast = rf.decode_fast(fast, z, SMALL)
    np.testing.assert_allclose(
        np.asarray(x_fast), np.asarray(x_ref), atol=1e-5)


def test_fast_roundtrip_exact(rng):
    params = init_revresnet(jax.random.PRNGKey(2), SMALL)
    fast = rf.pack_revresnet(params, SMALL)
    x = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
    z = rf.encode_fast(fast, x, SMALL)
    x_rec = rf.decode_fast(fast, z, SMALL)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-4)


def test_packed_latent_equivalence(rng):
    """The global cWCT commutes with the latent pixel-shuffles (every
    shuffled pixel's vector is a contiguous C-chunk of the pre-shuffle
    channels), so the packed-latent fast path must reproduce the shuffled
    path exactly."""
    from vstnet_tpu.models import cwct

    params = init_revresnet(jax.random.PRNGKey(3), SMALL)
    fast = rf.pack_revresnet(params, SMALL)
    x = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)), jnp.float32)
    s = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
    c = SMALL.latent_channels

    z = rf.encode_fast(fast, x, SMALL)
    zs = rf.encode_fast(fast, s, SMALL)
    ls, mu = cwct.style_factors(zs)
    y = rf.decode_fast(fast, cwct.transfer_with_factors(z, ls, mu), SMALL)

    zp = rf.encode_fast(fast, x, SMALL, packed_latent=True)
    zsp = rf.encode_fast(fast, s, SMALL, packed_latent=True)
    lsp, mup = cwct.style_factors_packed(zsp, c)
    np.testing.assert_allclose(np.asarray(lsp), np.asarray(ls), atol=1e-5)
    np.testing.assert_allclose(np.asarray(mup), np.asarray(mu), atol=1e-5)
    yp = rf.decode_fast(
        fast, cwct.transfer_with_factors_packed(zp, lsp, mup, c), SMALL,
        packed_latent=True)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(y), atol=1e-4)


def _rand_branch(rng, cin, mid, cout):
    def conv(ci, co):
        return {
            "w": jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.2,
                             jnp.float32),
            "b": jnp.asarray(rng.standard_normal((co,)) * 0.1, jnp.float32),
        }

    return {"conv1": conv(cin, mid), "conv2": conv(mid, mid),
            "conv3": conv(mid, cout)}


@pytest.mark.parametrize("c,mid,h,w", [
    (16, 4, 32, 48), (8, 2, 16, 20), (16, 4, 16, 128),
    (128, 32, 16, 128),  # c >= 128: conv3 takes the split-ky dot path
])
def test_fused_coupling_flat_parity(rng, c, mid, h, w):
    """Flat rows-in-lanes kernel == XLA reference branch (reflect-pad
    border semantics of RevResNet.py:79-88), forward and inverse."""
    from vstnet_tpu.ops import coupling_flat as cf
    from vstnet_tpu.ops.pad_conv import residual_branch

    branch = _rand_branch(rng, c, mid, c)
    packed = cf.pack_branch_weights_flat(branch)

    x1 = jnp.asarray(rng.standard_normal((2, h, w, c)), jnp.float32)
    x2 = jnp.asarray(rng.standard_normal((2, h, w, c)), jnp.float32)
    ref_fwd = np.asarray(residual_branch(x2, branch) + x1)
    ref_inv = np.asarray(x1 - residual_branch(x2, branch))

    x1f = cf.nhwc_to_flat(x1)
    x2f = cf.nhwc_to_flat(x2)
    th = h // 2
    got_fwd = np.asarray(cf.flat_to_nhwc(
        cf.fused_coupling_flat(x1f, x2f, packed, h, w, th=th,
                               interpret=True), h, w))
    got_inv = np.asarray(cf.flat_to_nhwc(
        cf.fused_coupling_flat(x1f, x2f, packed, h, w, th=th, inverse=True,
                               interpret=True), h, w))
    # At c >= 128 conv3 runs split-ky (three per-row-tap dots; add order
    # matches the unsplit kernel bit-for-bit, coupling_flat.py). The wider
    # tolerance is NOT from splitting — it covers f32 roundoff vs the XLA
    # reference over the much deeper K = 9*mid reduction at c=128/mid=32.
    atol = 2e-5 if c < 128 else 3e-4
    np.testing.assert_allclose(got_fwd, ref_fwd, atol=atol)
    np.testing.assert_allclose(got_inv, ref_inv, atol=atol)


@pytest.mark.parametrize("c,mid,h,w,th", [
    (16, 4, 32, 128, 8),   # top/interior/bottom tiles
    (16, 4, 24, 256, 12),  # exactly two tiles (top tile is not bottom)
    (8, 2, 64, 128, 16),
])
def test_fused_coupling_flat_nopad_parity(rng, c, mid, h, w, th):
    """The zero-copy entry path (padded=False, S == W): the kernel reads
    the raw (B,C,H*W) reshape, clips its halo window, and rolls the
    boundary tiles — must equal both the XLA reference branch and the
    padded kernel, forward and inverse."""
    from vstnet_tpu.ops import coupling_flat as cf
    from vstnet_tpu.ops.pad_conv import residual_branch

    branch = _rand_branch(rng, c, mid, c)
    packed = cf.pack_branch_weights_flat(branch)

    x1 = jnp.asarray(rng.standard_normal((2, h, w, c)), jnp.float32)
    x2 = jnp.asarray(rng.standard_normal((2, h, w, c)), jnp.float32)
    ref_fwd = np.asarray(residual_branch(x2, branch) + x1)
    ref_inv = np.asarray(x1 - residual_branch(x2, branch))

    x1n = jnp.transpose(x1, (0, 3, 1, 2)).reshape(2, c, h * w)
    x2n = jnp.transpose(x2, (0, 3, 1, 2)).reshape(2, c, h * w)

    def back(yf):
        return np.asarray(jnp.transpose(
            yf.reshape(2, c, h, w), (0, 2, 3, 1)))

    got_fwd = back(cf.fused_coupling_flat(
        x1n, x2n, packed, h, w, th=th, interpret=True, padded=False))
    got_inv = back(cf.fused_coupling_flat(
        x1n, x2n, packed, h, w, th=th, inverse=True, interpret=True,
        padded=False))
    np.testing.assert_allclose(got_fwd, ref_fwd, atol=2e-5)
    np.testing.assert_allclose(got_inv, ref_inv, atol=2e-5)


def _rand_tr_branch(rng, cin, mid):
    def conv(ci, co):
        return {
            "w": jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.2,
                             jnp.float32),
            "b": jnp.asarray(rng.standard_normal((co,)) * 0.1, jnp.float32),
        }

    return {"conv1": conv(cin, mid), "conv2": conv(mid, mid),
            "conv3": conv(mid, 4 * cin)}


@pytest.mark.parametrize("c,mid,h,w,padded", [
    (16, 16, 16, 24, True),    # the stage2-transition shape family
    (4, 2, 32, 20, True),      # non-multiple-of-8 mid (padding path)
    (16, 16, 32, 256, False),  # zero-copy form (half-res W = 128)
    (8, 4, 32, 256, False),    # two half-res tiles, top != bottom
])
def test_fused_transition_flat_parity(rng, c, mid, h, w, padded):
    """Stride-2 transition kernel == the XLA reference block (stride-2
    reflect-pad conv branch at full res + pixel unshuffle, the fast
    path's own NCHW fallback), forward and inverse. Exercises the 2x2
    phase conv's top-row copy-reflection and the phase-masked column
    substitution at both layouts."""
    from vstnet_tpu.ops import coupling_flat as cf
    from vstnet_tpu.ops.coupling import pixel_unshuffle_nchw

    branch = _rand_tr_branch(rng, c, mid)
    packed = cf.pack_transition_weights_flat(branch)

    x1 = jnp.asarray(rng.standard_normal((2, c, h, w)), jnp.float32)
    x2 = jnp.asarray(rng.standard_normal((2, c, h, w)), jnp.float32)
    fx2 = rf._branch_nchw(x2, branch, 2)
    x1u = pixel_unshuffle_nchw(x1)
    x2u = pixel_unshuffle_nchw(x2)
    ref_fwd = np.asarray(fx2 + x1u)
    hh, wh, cu = h // 2, w // 2, 4 * c

    def to_flat(t):
        if padded:
            return cf.nhwc_to_flat(jnp.transpose(t, (0, 2, 3, 1)))
        return t.reshape(2, cu, hh * wh)

    def from_flat(tf):
        if padded:
            return np.asarray(jnp.transpose(
                cf.flat_to_nhwc(tf, hh, wh), (0, 3, 1, 2)))
        return np.asarray(tf.reshape(2, cu, hh, wh))

    th = 4 if padded else 8
    got_fwd = from_flat(cf.fused_transition_flat(
        to_flat(x1u), to_flat(x2u), packed, hh, wh, th=th,
        interpret=True, padded=padded))
    np.testing.assert_allclose(got_fwd, ref_fwd, atol=2e-5)

    # inverse: (y1=x2u, y2=fwd) -> recovers x1u
    got_inv = from_flat(cf.fused_transition_flat(
        to_flat(jnp.asarray(ref_fwd)), to_flat(x2u), packed, hh, wh,
        th=th, inverse=True, interpret=True, padded=padded))
    np.testing.assert_allclose(got_inv, np.asarray(x1u), atol=2e-5)


@pytest.mark.parametrize("c,mid,h,w,th", [
    (16, 16, 32, 256, 8),   # stage1->2 family; 2 half-res tiles
    (8, 4, 48, 256, 8),     # 3 tiles: top/interior/bottom programs
    (16, 16, 64, 256, 16),  # production-ish tile
])
def test_fused_transition_full_parity(rng, c, mid, h, w, th):
    """Full-res-boundary transition (IN-KERNEL pixel (un)shuffle) ==
    pixel_unshuffle + fused_transition_flat, bit-for-bit in f32, both
    directions — the q-phase strided loads/stores, p-phase segment
    (de)interleave, and the full-row window clip must reproduce the
    validated half-res kernel exactly."""
    from vstnet_tpu.ops import coupling_flat as cf
    from vstnet_tpu.ops.coupling import (
        pixel_shuffle_nchw,
        pixel_unshuffle_nchw,
    )

    branch = _rand_tr_branch(rng, c, mid)
    packed = cf.pack_transition_weights_flat(branch)

    x1 = jnp.asarray(rng.standard_normal((2, c, h, w)), jnp.float32)
    x2 = jnp.asarray(rng.standard_normal((2, c, h, w)), jnp.float32)
    hh, wh, cu = h // 2, w // 2, 4 * c
    x1u = pixel_unshuffle_nchw(x1)
    x2u = pixel_unshuffle_nchw(x2)

    ref_y = cf.fused_transition_flat(
        x1u.reshape(2, cu, hh * wh), x2u.reshape(2, cu, hh * wh),
        packed, hh, wh, th=th, interpret=True, padded=False)

    got_x1f, got_yf = cf.fused_transition_full(
        x1, x2, packed, hh, wh, th=th, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(got_x1f), np.asarray(x2u.reshape(2, cu, hh * wh)))
    np.testing.assert_array_equal(np.asarray(got_yf), np.asarray(ref_y))

    # inverse: (y2=ref_y, y1=x2u) -> (shuffle(x1u), shuffle(x2u)) exactly
    got_x1, got_x2 = cf.fused_transition_full(
        ref_y, x2u.reshape(2, cu, hh * wh), packed, hh, wh, th=th,
        inverse=True, interpret=True)
    ref_x1u = cf.fused_transition_flat(
        ref_y, x2u.reshape(2, cu, hh * wh), packed, hh, wh, th=th,
        inverse=True, interpret=True, padded=False)
    np.testing.assert_array_equal(
        np.asarray(got_x1),
        np.asarray(pixel_shuffle_nchw(ref_x1u.reshape(2, cu, hh, wh))))
    np.testing.assert_array_equal(np.asarray(got_x2), np.asarray(x2))


def test_encode_fast_full_boundary_route(rng, monkeypatch):
    """End-to-end fast path with TR_FULL_FUSE on: the stage1->2
    transition takes the full-res-boundary kernel (half width 128), the
    stage2->3 one falls back to the legacy route (half width 64) — mixed
    routing must still match the standard path exactly and invert."""
    monkeypatch.setattr(rf, "TR_FULL_FUSE", True)
    params = init_revresnet(jax.random.PRNGKey(5), SMALL)
    fast = rf.pack_revresnet(params, SMALL)
    x = jnp.asarray(rng.uniform(size=(1, 32, 256, 3)), jnp.float32)

    # route sanity: the first transition qualifies, the second doesn't
    assert rf._tr_full_th(16, 128, 64) is not None
    assert rf._tr_full_th(8, 64, 256) is None

    z_ref = encode(params, x, SMALL)
    z_fast = rf.encode_fast(fast, x, SMALL)
    np.testing.assert_allclose(np.asarray(z_fast), np.asarray(z_ref),
                               atol=1e-5)
    x_rec = rf.decode_fast(fast, z_fast, SMALL)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x),
                               atol=1e-5)

    # large-batch routing: with the full route available the transition
    # stays FUSED above TR_FUSE_MAX_BATCH (the point of the kernel)
    runs = rf._segments(fast, SMALL.block_plan(),
                        rf.TR_FUSE_MAX_BATCH + 1, (32, 256))
    kinds = [(k, tr is not None) for k, tr, _ in runs]
    assert ("fused", True) in kinds


def test_encode_fast_nopad_stage_parity(rng, monkeypatch):
    """Stage-level no-pad routing (production shapes have th < h, e.g.
    th=64 at 512²): force a sub-height tile so _nopad_ok fires, and check
    encode/decode parity + exact inversion against the standard path."""
    monkeypatch.setattr(rf, "pick_tile",
                        lambda h, c, w, dtype_bytes=2, nopad=False: h // 2)
    params = init_revresnet(jax.random.PRNGKey(3), SMALL)
    fast = rf.pack_revresnet(params, SMALL)
    x = jnp.asarray(rng.uniform(size=(1, 32, 128, 3)), jnp.float32)
    z_ref = encode(params, x, SMALL)
    z_fast = rf.encode_fast(fast, x, SMALL)
    np.testing.assert_allclose(np.asarray(z_fast), np.asarray(z_ref),
                               atol=1e-5)
    x_rec = rf.decode_fast(fast, z_fast, SMALL)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-4)


def test_flat_layout_roundtrip(rng):
    from vstnet_tpu.ops import coupling_flat as cf

    x = jnp.asarray(rng.standard_normal((2, 12, 20, 16)), jnp.float32)
    xf = cf.nhwc_to_flat(x)
    np.testing.assert_array_equal(np.asarray(cf.flat_to_nhwc(xf, 12, 20)),
                                  np.asarray(x))


def test_pick_tile():
    th = rf.pick_tile(512, c=16, w=512)
    assert 512 % th == 0 and th >= 32
    th2 = rf.pick_tile(256, c=64, w=256)
    assert 256 % th2 == 0 and th2 >= 8
    assert 27 % rf.pick_tile(27, c=16, w=108) == 0


@pytest.mark.parametrize("use_masks", [False, True])
def test_photo_forward_fast_agreement(rng, use_masks):
    """photo_forward_fast (bf16 fused path) vs photo_forward (f32): same
    semantics, PSNR >= 40 dB (the BASELINE.md fidelity bar)."""
    from vstnet_tpu.models.pipeline import photo_forward, photo_forward_fast

    params = init_revresnet(jax.random.PRNGKey(4), SMALL)
    fast = rf.pack_revresnet(params, SMALL, dtype=jnp.bfloat16)
    c = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
    s = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
    cm = jnp.asarray(rng.integers(0, 3, size=(1, 32, 32)), jnp.int32)
    sm = jnp.asarray(rng.integers(0, 3, size=(1, 32, 32)), jnp.int32)

    ref = np.asarray(photo_forward(params, c, s, cm, sm, SMALL,
                                   max_labels=4, use_masks=use_masks))
    got = np.asarray(photo_forward_fast(fast, c, s, cm, sm, SMALL,
                                        max_labels=4, use_masks=use_masks))
    assert got.shape == ref.shape
    mse = float(((got - ref) ** 2).mean())
    psnr = 10 * np.log10(1.0 / mse) if mse > 0 else float("inf")
    assert psnr >= 40.0, f"fast photo path PSNR {psnr:.1f} dB < 40"


def test_stylize_fast_agreement(rng):
    """Research-tier fast stylize (global + masked) vs the f32 functions."""
    from vstnet_tpu.models.pipeline import (
        stylize,
        stylize_fast,
        stylize_masked,
        stylize_masked_fast,
    )

    params = init_revresnet(jax.random.PRNGKey(5), SMALL)
    fast = rf.pack_revresnet(params, SMALL, dtype=jnp.bfloat16)
    c = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
    s = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)

    def psnr(a, b):
        mse = float(((a - b) ** 2).mean())
        return 10 * np.log10(1.0 / mse) if mse > 0 else float("inf")

    ref = np.asarray(stylize(params, c, s, SMALL))
    got = np.asarray(stylize_fast(fast, c, s, SMALL))
    assert psnr(got, ref) >= 40.0

    cm = jnp.asarray(rng.integers(0, 3, size=(1, 32, 32)), jnp.int32)
    sm = jnp.asarray(rng.integers(0, 3, size=(1, 32, 32)), jnp.int32)
    ref = np.asarray(stylize_masked(params, c, s, cm, sm, SMALL,
                                    max_labels=4))
    got = np.asarray(stylize_masked_fast(fast, c, s, cm, sm, SMALL,
                                         max_labels=4))
    assert psnr(got, ref) >= 40.0

    # interpolation route (--alpha_c --fast in the image CLI)
    from vstnet_tpu.models.pipeline import stylize_interp, stylize_interp_fast

    for a in (0.0, 0.5):
        ref = np.asarray(stylize_interp(params, c, s[None],
                                        jnp.asarray([1.0]), SMALL,
                                        alpha_c=a))
        got = np.asarray(stylize_interp_fast(fast, c, s, SMALL,
                                             jnp.float32(a)))
        assert psnr(got, ref) >= 40.0, f"interp fast alpha_c={a}"


def test_masked_video_fast_program_agreement(rng):
    """The exact composition cli/video_transfer.py dispatches per batch on
    the masked FAST path — composed video_remap -> encode_fast ->
    transfer_masked_factored (style side precomputed once) -> decode_fast
    — vs the f32 masked program (sequential remap + transfer_masked),
    PSNR >= 40 dB."""
    from vstnet_tpu.models import cwct
    from vstnet_tpu.models.remapping import (
        cross_remapping,
        load_label_mapping,
        self_remapping,
        video_remap,
        video_remap_plan,
    )

    mapping = load_label_mapping()
    params = init_revresnet(jax.random.PRNGKey(6), SMALL)
    fast = rf.pack_revresnet(params, SMALL, dtype=jnp.bfloat16)

    b, h, w = 2, 32, 32
    frames = jnp.asarray(rng.uniform(size=(b, h, w, 3)), jnp.float32)
    style = jnp.asarray(rng.uniform(size=(1, h, w, 3)), jnp.float32)
    r = np.random.default_rng(9)
    cm0 = jnp.asarray(
        r.choice(np.array([3, 17, 52]), size=(b, h, w)), jnp.int32)
    sm = jnp.asarray(
        r.choice(np.array([3, 52, 76]), size=(1, h, w)), jnp.int32)
    sm = self_remapping(sm, mapping, 0.02)

    # f32 reference program (what --precision f32 runs)
    cm_ref = cross_remapping(
        self_remapping(cm0, mapping, 0.02),
        jnp.broadcast_to(sm, (b, h, w)), mapping)
    z_c = encode(params, frames, SMALL)
    z_s = encode(params, style, SMALL)
    z_ss = jnp.broadcast_to(z_s, (b, *z_s.shape[1:]))
    z_cs = cwct.transfer_masked(
        z_c, z_ss, cm_ref, jnp.broadcast_to(sm, (b, h, w)), max_labels=8)
    ref = np.asarray(decode(params, z_cs, SMALL))

    # fast program (what --precision bf16 runs)
    in_style, cross_tab = video_remap_plan(sm, mapping)
    cm_fast = video_remap(cm0, in_style, cross_tab, mapping, 0.02)
    np.testing.assert_array_equal(np.asarray(cm_fast), np.asarray(cm_ref))
    z_sf = rf.encode_fast(fast, style.astype(jnp.bfloat16), SMALL)
    labels, ns, mean_s, cov_s = cwct.style_region_factors(
        z_sf, sm, max_labels=8)
    z_cf = rf.encode_fast(fast, frames.astype(jnp.bfloat16), SMALL)
    z_csf = cwct.transfer_masked_factored(
        z_cf, cm_fast, labels, ns, mean_s, cov_s)
    got = np.asarray(
        rf.decode_fast(fast, z_csf.astype(jnp.bfloat16), SMALL))

    mse = float(((got.astype(np.float64) - ref) ** 2).mean())
    psnr = 10 * np.log10(1.0 / mse) if mse > 0 else float("inf")
    assert psnr >= 40.0, f"masked video fast program PSNR {psnr:.1f} dB"


def test_interp_packed_matches_interpolation(rng):
    """The fused --alpha_c video path: interp_with_factors_packed on the
    packed latent (style factored once, alpha_c traced) must equal
    cwct.interpolation on the shuffled latent — the exact program
    cli/video_transfer.py dispatches per batch when --alpha_c is set with
    --precision bf16. f32 throughout for exact comparison."""
    from vstnet_tpu.models import cwct

    params = init_revresnet(jax.random.PRNGKey(7), SMALL)
    fast = rf.pack_revresnet(params, SMALL)
    c_lat = SMALL.latent_channels
    frames = jnp.asarray(rng.uniform(size=(2, 16, 16, 3)), jnp.float32)
    style = jnp.asarray(rng.uniform(size=(1, 16, 16, 3)), jnp.float32)

    zp_s = rf.encode_fast(fast, style, SMALL, packed_latent=True)
    ls_p, mu_p = cwct.style_factors_packed(zp_s, c_lat)
    zp_c = rf.encode_fast(fast, frames, SMALL, packed_latent=True)

    z_c = encode(params, frames, SMALL)
    z_s = encode(params, style, SMALL)

    for alpha_c in (0.0, 0.35, 1.0):
        zp_cs = cwct.interp_with_factors_packed(
            zp_c, ls_p, mu_p, jnp.float32(alpha_c), c_lat)
        got = np.asarray(rf.decode_fast(fast, zp_cs, SMALL,
                                        packed_latent=True))
        z_ref = cwct.interpolation(z_c, z_s[None], jnp.asarray([1.0]),
                                   alpha_c=alpha_c)
        want = np.asarray(decode(params, z_ref, SMALL))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    # alpha_c == 0 degenerates to the plain factored transfer
    zp0 = cwct.interp_with_factors_packed(
        zp_c, ls_p, mu_p, jnp.float32(0.0), c_lat)
    zt = cwct.transfer_with_factors_packed(zp_c, ls_p, mu_p, c_lat)
    np.testing.assert_allclose(np.asarray(zp0), np.asarray(zt), atol=1e-5)


def test_stylize_fast_artistic_config(rng):
    """The fused path serves the ARTISTIC profile too (hidden_dim=64,
    sp_steps=1 -> 128*4^1-grouped packed latent at 1/4 res; reference
    image_transfer.py:48). Global fast stylize >= 40 dB vs f32."""
    from vstnet_tpu.models.pipeline import stylize, stylize_fast

    ART = RevResNetConfig(n_blocks=(2, 2, 2), hidden_dim=64, sp_steps=1)
    params = init_revresnet(jax.random.PRNGKey(7), ART)
    fast = rf.pack_revresnet(params, ART, dtype=jnp.bfloat16)
    c = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
    s = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)

    ref = np.asarray(stylize(params, c, s, ART))
    got = np.asarray(stylize_fast(fast, c, s, ART))
    mse = float(((got - ref) ** 2).mean())
    psnr = 10 * np.log10(1.0 / mse) if mse > 0 else float("inf")
    assert psnr >= 40.0, f"artistic fast path PSNR {psnr:.1f} dB"

    # exact fast-path inverse in the artistic layout
    z = rf.encode_fast(fast, c.astype(jnp.bfloat16), ART)
    xr = rf.decode_fast(fast, z, ART)
    assert xr.shape == c.shape


def test_stylize_interp_multi_fast_agreement(rng):
    """Fused bf16 multi-style interpolation vs the f32 stylize_interp:
    same alpha_s factor mixing (cWCT.py:206-262 semantics), PSNR-gated."""
    from vstnet_tpu.models.pipeline import (
        stylize_interp,
        stylize_interp_multi_fast,
    )

    params = init_revresnet(jax.random.PRNGKey(7), SMALL)
    fast = rf.pack_revresnet(params, SMALL, dtype=jnp.bfloat16)
    c = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
    s1 = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
    s2 = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)) * 0.4, jnp.float32)
    styles = jnp.concatenate([s1, s2], axis=0)           # (2, 32, 32, 3)
    w = jnp.asarray([0.3, 0.7])

    def psnr(a, b):
        mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
        return 10 * np.log10(1.0 / mse) if mse > 0 else float("inf")

    for a_c in (0.0, 0.25):
        ref = stylize_interp(params, c, styles[:, None], w, SMALL,
                             alpha_c=a_c)
        got = stylize_interp_multi_fast(fast, c, styles, w, SMALL,
                                        jnp.float32(a_c))
        assert psnr(got, ref) >= 40.0, f"multi-style fast alpha_c={a_c}"
