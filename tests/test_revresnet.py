"""RevResNet: shape contracts and the exact-inverse oracle.

The reference has no unit tests; its implicit correctness oracle is the
reversibility of the architecture (SURVEY.md §4). decode(encode(x)) == x up
to float tolerance is the strongest single check of the whole conv stack.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vstnet_tpu.config import ARTISTIC_CONFIG, PHOTO_CONFIG, RevResNetConfig
from vstnet_tpu.models.revresnet import decode, encode, init_revresnet


# Small config: same structure, fewer blocks -> fast CPU tests.
SMALL = RevResNetConfig(n_blocks=(2, 2, 2), hidden_dim=16, sp_steps=2)
SMALL_ART = RevResNetConfig(n_blocks=(2, 2, 2), hidden_dim=64, sp_steps=1)


@pytest.mark.parametrize(
    "cfg,latent_ch,latent_scale",
    [(SMALL, 32, 1), (SMALL_ART, 128, 2)],
)
def test_encode_shapes(cfg, latent_ch, latent_scale, rng):
    params = init_revresnet(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.uniform(size=(1, 32, 48, 3)), jnp.float32)
    z = encode(params, x, cfg)
    assert z.shape == (1, 32 // latent_scale, 48 // latent_scale, latent_ch)


@pytest.mark.parametrize("cfg", [SMALL, SMALL_ART])
def test_exact_inverse(cfg, rng):
    params = init_revresnet(jax.random.PRNGKey(1), cfg)
    x = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)), jnp.float32)
    z = encode(params, x, cfg)
    x_rec = decode(params, z, cfg)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-4)


def test_full_depth_inverse_photo(rng):
    """Full 30-block photo config: inverse error stays within PSNR-40dB land."""
    params = init_revresnet(jax.random.PRNGKey(2), PHOTO_CONFIG)
    x = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
    z = encode(params, x, PHOTO_CONFIG)
    assert z.shape == (1, 32, 32, 32)
    x_rec = decode(params, z, PHOTO_CONFIG)
    err = np.abs(np.asarray(x_rec) - np.asarray(x)).max()
    assert err < 1e-3, f"max inverse error {err}"


def test_full_depth_latent_shape_artistic(rng):
    params = init_revresnet(jax.random.PRNGKey(3), ARTISTIC_CONFIG)
    x = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
    z = encode(params, x, ARTISTIC_CONFIG)
    assert z.shape == (1, 16, 16, 128)


def test_jit_encode_decode(rng):
    cfg = SMALL
    params = init_revresnet(jax.random.PRNGKey(4), cfg)
    enc = jax.jit(lambda p, x: encode(p, x, cfg))
    dec = jax.jit(lambda p, z: decode(p, z, cfg))
    x = jnp.asarray(rng.uniform(size=(1, 16, 16, 3)), jnp.float32)
    z = enc(params, x)
    x_rec = dec(params, z)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-4)
