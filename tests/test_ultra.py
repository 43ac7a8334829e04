"""Ultra-resolution tiled stylization (models/ultra.py).

The correctness contract: (1) every latent pixel's statistics are owned by
exactly one tile, (2) with overlap >= the receptive field the tiled result
matches the whole-image pipeline, (3) practical (small) overlaps stay
PSNR-close — seams are blended approximations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vstnet_tpu.config import RevResNetConfig
from vstnet_tpu.models import cwct, ultra
from vstnet_tpu.models.revresnet import decode, encode, init_revresnet

TINY = RevResNetConfig(n_blocks=(1, 1, 1), hidden_dim=16, sp_steps=2)


def _psnr(a, b):
    mse = float(np.mean((a - b) ** 2))
    return 10 * np.log10(1.0 / mse) if mse > 0 else np.inf


def test_receptive_field():
    assert ultra.receptive_field(TINY) == 3 + 6 + 12 + 24
    assert ultra.receptive_field(RevResNetConfig()) == 30 + 60 + 120 + 24


@pytest.mark.parametrize("h,w,tile,overlap", [
    (256, 256, 128, 32), (200, 152, 96, 24), (128, 320, 128, 16),
])
def test_ownership_exactly_once(h, w, tile, overlap):
    assert ultra.ownership_check(h, w, TINY, tile, overlap)


def test_tiled_matches_whole_image(rng):
    """Exactness regime: overlap >= encode+decode receptive field."""
    cfg = TINY
    rf = ultra.receptive_field(cfg)
    params = init_revresnet(jax.random.PRNGKey(0), cfg)
    c = jnp.asarray(rng.uniform(size=(1, 192, 160, 3)), jnp.float32)
    s = jnp.asarray(rng.uniform(size=(1, 96, 96, 3)), jnp.float32)

    whole = np.asarray(
        decode(params, cwct.transfer(encode(params, c, cfg),
                                     encode(params, s, cfg)), cfg))
    tiled = np.asarray(ultra.stylize_tiled(
        params, c, s, cfg, tile=160, overlap=rf + (-rf) % 4))
    psnr = _psnr(tiled, whole)
    assert psnr > 55.0, f"exact-regime tiled PSNR {psnr:.1f} dB"


def test_tiled_practical_overlap(rng):
    """Practical regime: small overlap, blended seams — PSNR-gated."""
    cfg = TINY
    params = init_revresnet(jax.random.PRNGKey(1), cfg)
    c = jnp.asarray(rng.uniform(size=(1, 192, 192, 3)), jnp.float32)
    s = jnp.asarray(rng.uniform(size=(1, 96, 96, 3)), jnp.float32)

    whole = np.asarray(
        decode(params, cwct.transfer(encode(params, c, cfg),
                                     encode(params, s, cfg)), cfg))
    tiled = np.asarray(ultra.stylize_tiled(
        params, c, s, cfg, tile=96, overlap=24))
    assert np.isfinite(tiled).all()
    psnr = _psnr(tiled, whole)
    assert psnr > 30.0, f"practical tiled PSNR {psnr:.1f} dB"


def test_tiled_masked_matches_whole_image(rng):
    """Regional streaming statistics: per-label moments accumulated across
    tile-owned regions == whole-image masked transfer (exact-regime
    overlap)."""
    from vstnet_tpu.models.pipeline import stylize_masked

    cfg = TINY
    rf = ultra.receptive_field(cfg)
    params = init_revresnet(jax.random.PRNGKey(2), cfg)
    c = jnp.asarray(rng.uniform(size=(1, 192, 160, 3)), jnp.float32)
    s = jnp.asarray(rng.uniform(size=(1, 96, 96, 3)), jnp.float32)
    # blocky labels so every region clears the min-pixel validity rule
    cm = jnp.asarray(
        (np.add.outer(np.arange(192) // 96, np.arange(160) // 80))[None],
        jnp.int32)
    sm = jnp.asarray(
        (np.add.outer(np.arange(96) // 48, np.arange(96) // 48))[None],
        jnp.int32)

    whole = np.asarray(stylize_masked(params, c, s, cm, sm, cfg,
                                      max_labels=4))
    tiled = np.asarray(ultra.stylize_tiled_masked(
        params, c, s, cm, sm, cfg, tile=160, overlap=rf + (-rf) % 4,
        max_labels=4))
    psnr = _psnr(tiled, whole)
    assert psnr > 55.0, f"exact-regime masked tiled PSNR {psnr:.1f} dB"


def test_tiled_masked_practical_overlap(rng):
    from vstnet_tpu.models.pipeline import stylize_masked

    cfg = TINY
    params = init_revresnet(jax.random.PRNGKey(3), cfg)
    c = jnp.asarray(rng.uniform(size=(1, 192, 192, 3)), jnp.float32)
    s = jnp.asarray(rng.uniform(size=(1, 96, 96, 3)), jnp.float32)
    cm = jnp.asarray((np.add.outer(np.arange(192) // 96,
                                   np.arange(192) // 96))[None], jnp.int32)
    sm = jnp.asarray((np.add.outer(np.arange(96) // 48,
                                   np.arange(96) // 48))[None], jnp.int32)

    whole = np.asarray(stylize_masked(params, c, s, cm, sm, cfg,
                                      max_labels=4))
    tiled = np.asarray(ultra.stylize_tiled_masked(
        params, c, s, cm, sm, cfg, tile=96, overlap=24, max_labels=4))
    assert np.isfinite(tiled).all()
    psnr = _psnr(tiled, whole)
    assert psnr > 30.0, f"practical masked tiled PSNR {psnr:.1f} dB"


def test_tiled_interp_matches_whole_image(rng):
    """alpha_c interpolation through the tiler == whole-image
    stylize_interp (exact-regime overlap)."""
    from vstnet_tpu.models.pipeline import stylize_interp

    cfg = TINY
    rf = ultra.receptive_field(cfg)
    params = init_revresnet(jax.random.PRNGKey(4), cfg)
    c = jnp.asarray(rng.uniform(size=(1, 192, 160, 3)), jnp.float32)
    s = jnp.asarray(rng.uniform(size=(1, 96, 96, 3)), jnp.float32)

    whole = np.asarray(stylize_interp(
        params, c, s[None], jnp.asarray([1.0]), cfg, alpha_c=0.4))
    tiled = np.asarray(ultra.stylize_tiled_interp(
        params, c, [s], jnp.asarray([1.0]), cfg, alpha_c=0.4,
        tile=160, overlap=rf + (-rf) % 4))
    psnr = _psnr(tiled, whole)
    assert psnr > 55.0, f"exact-regime interp tiled PSNR {psnr:.1f} dB"


def test_tiled_fast_path_routing(rng, monkeypatch):
    """fast_params routes tile encode/decode through the fused flat
    kernels (interpret mode on CPU, f32 pack => near-exact vs the
    standard tiled path)."""
    import vstnet_tpu.models.revresnet_fast as rfm
    import vstnet_tpu.ops.coupling_flat as cflat

    from tests.conftest import patch_interpret_fused

    patch_interpret_fused(monkeypatch)

    cfg = TINY
    params = init_revresnet(jax.random.PRNGKey(5), cfg)
    fast = rfm.pack_revresnet(params, cfg)  # f32: exact comparison
    c = jnp.asarray(rng.uniform(size=(1, 96, 96, 3)), jnp.float32)
    s = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), jnp.float32)

    ref = np.asarray(ultra.stylize_tiled(params, c, s, cfg, tile=64,
                                         overlap=16))
    got = np.asarray(ultra.stylize_tiled(params, c, s, cfg, tile=64,
                                         overlap=16, fast_params=fast))
    psnr = _psnr(got, ref)
    assert psnr > 55.0, f"fast-tiled vs tiled PSNR {psnr:.1f} dB"


def test_tiled_masked_label_overflow_raises(rng):
    """A mask with more distinct labels than max_labels must fail loudly
    (silent content-passthrough for the dropped labels is the bug)."""
    cfg = TINY
    params = init_revresnet(jax.random.PRNGKey(2), cfg)
    c = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), jnp.float32)
    s = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), jnp.float32)
    cm = jnp.asarray(np.arange(64 * 64).reshape(1, 64, 64) % 7, jnp.int32)
    sm = jnp.zeros((1, 64, 64), jnp.int32)
    with pytest.raises(ValueError, match="distinct labels"):
        ultra.stylize_tiled_masked(params, c, s, cm, sm, cfg,
                                   tile=64, overlap=0, max_labels=4)
