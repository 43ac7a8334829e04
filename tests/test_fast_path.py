"""Fast-path (fused Pallas CW) parity vs the standard path.

On CPU the kernels run in interpret mode via the pallas interpret flag
being implied... actually pallas_call on CPU backend requires
interpret=True; these tests monkeypatch the fused call accordingly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vstnet_tpu.ops.coupling_cw as ccw
import vstnet_tpu.models.revresnet_fast as rf
from vstnet_tpu.config import RevResNetConfig
from vstnet_tpu.models.revresnet import decode, encode, init_revresnet

SMALL = RevResNetConfig(n_blocks=(2, 2, 2), hidden_dim=16, sp_steps=2)


@pytest.fixture(autouse=True)
def _interpret_pallas(monkeypatch):
    orig = ccw.fused_coupling_cw

    def patched(x1, x2, packed, th=16, inverse=False, interpret=False):
        return orig(x1, x2, packed, th=th, inverse=inverse, interpret=True)

    monkeypatch.setattr(ccw, "fused_coupling_cw", patched)
    monkeypatch.setattr(rf, "fused_coupling_cw", patched)
    yield


def test_encode_fast_parity(rng):
    params = init_revresnet(jax.random.PRNGKey(0), SMALL)
    fast = rf.pack_revresnet(params, SMALL)
    x = jnp.asarray(rng.uniform(size=(1, 32, 48, 3)), jnp.float32)
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


def test_pick_tile():
    th = rf.pick_tile(512, c=16, w=512)
    assert 512 % th == 0 and th >= 8
    # VMEM constraint: conv3 intermediate under budget
    assert 9 * 16 * (th + 6) * 518 * 4 <= rf.VMEM_BUDGET + 9 * 16 * 518 * 4 * 6
    th2 = rf.pick_tile(256, c=64, w=256)
    assert 256 % th2 == 0 and th2 >= 1
    assert 27 % rf.pick_tile(27, c=16, w=108) == 0
