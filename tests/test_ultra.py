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
