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
    orig = cflat.fused_coupling_flat

    def patched(x1f, x2f, packed, h, w, th=64, inverse=False,
                interpret=False):
        return orig(x1f, x2f, packed, h, w, th=th, inverse=inverse,
                    interpret=True)

    monkeypatch.setattr(cflat, "fused_coupling_flat", patched)
    monkeypatch.setattr(rf, "fused_coupling_flat", patched)
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


@pytest.mark.parametrize("c,mid,h,w", [(16, 4, 32, 48), (8, 2, 16, 20), (16, 4, 16, 128)])
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
    np.testing.assert_allclose(got_fwd, ref_fwd, atol=2e-5)
    np.testing.assert_allclose(got_inv, ref_inv, atol=2e-5)


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
