"""Cross-backend numeric parity: vstnet_tpu (JAX) vs the reference PyTorch
implementation, with shared random weights.

This replicates the reference's own correctness oracle — output equivalence
across backends (project/smoke.py's torch-vs-ONNX assert_close gate,
rtol=atol=0.01) — but much tighter, since both sides run f32.

The reference code is imported read-only from /root/reference (its `todos`
debug dependency is stubbed). No reference code is copied.
"""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from vstnet_tpu.config import RevResNetConfig
from vstnet_tpu.io.checkpoint import revresnet_from_torch, revresnet_to_torch
from vstnet_tpu.models.revresnet import decode, encode, init_revresnet

SMALL = RevResNetConfig(n_blocks=(2, 2, 2), hidden_dim=16, sp_steps=2)
SMALL_ART = RevResNetConfig(n_blocks=(2, 2, 2), hidden_dim=64, sp_steps=1)


@pytest.fixture(scope="module")
def reference_revresnet():
    """Import the reference RevResNet class with its debug deps stubbed."""
    todos = types.ModuleType("todos")
    todos.debug = types.SimpleNamespace(output_var=lambda *a, **k: None)
    sys.modules.setdefault("todos", todos)
    sys.path.insert(0, "/root/reference")
    try:
        from models.RevResNet import RevResNet  # type: ignore
    finally:
        sys.path.remove("/root/reference")
    return RevResNet


def _build_pair(cfg, Ref, seed=0):
    """Random JAX params loaded into the reference torch model via the
    checkpoint converter (exercises the converter in both directions)."""
    params = init_revresnet(jax.random.PRNGKey(seed), cfg)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in revresnet_to_torch(params).items()}
    tmodel = Ref(
        nBlocks=list(cfg.n_blocks),
        nStrides=list(cfg.strides),
        nChannels=list(cfg.channels),
        in_channel=cfg.in_channel,
        mult=cfg.mult,
        hidden_dim=cfg.hidden_dim,
        sp_steps=cfg.sp_steps,
    )
    tmodel.load_state_dict(sd)
    tmodel.eval()
    return params, tmodel


@pytest.mark.parametrize("cfg", [SMALL, SMALL_ART])
def test_encode_parity(cfg, reference_revresnet, rng):
    params, tmodel = _build_pair(cfg, reference_revresnet)
    x = rng.uniform(size=(1, 24, 32, 3)).astype(np.float32)

    z_jax = np.asarray(encode(params, jnp.asarray(x), cfg))  # NHWC
    with torch.no_grad():
        z_t = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)), forward=True)
    z_t = z_t.numpy().transpose(0, 2, 3, 1)

    # Activations reach ±15 with random init; tolerance covers f32
    # accumulation-order noise only (relative check via scaled atol).
    np.testing.assert_allclose(z_jax, z_t, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("cfg", [SMALL, SMALL_ART])
def test_decode_parity(cfg, reference_revresnet, rng):
    params, tmodel = _build_pair(cfg, reference_revresnet, seed=1)
    h, w, c = 24 // cfg.latent_scale, 32 // cfg.latent_scale, cfg.latent_channels
    z = rng.standard_normal((1, h, w, c)).astype(np.float32) * 0.1

    x_jax = np.asarray(decode(params, jnp.asarray(z), cfg))
    with torch.no_grad():
        x_t = tmodel(torch.from_numpy(z.transpose(0, 3, 1, 2)), forward=False)
    x_t = x_t.numpy().transpose(0, 2, 3, 1)

    np.testing.assert_allclose(x_jax, x_t, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("mode", ["photo", "artistic"])
def test_full_config_parity(mode, reference_revresnet, rng):
    """Production-depth (30-block) parity: full stylize (encode c/s -> cWCT
    -> decode) vs the imported torch reference at small resolution. Guards
    the inverse-pass error accumulation over all 32 blocks (SURVEY hard-part
    #2) in the automated suite — the reference's cross-backend gate is
    rtol=atol=0.01 (project/smoke.py:145); we additionally require the
    BASELINE >=40 dB PSNR."""
    from vstnet_tpu.config import ARTISTIC_CONFIG, PHOTO_CONFIG
    from vstnet_tpu.models import cwct

    cfg = PHOTO_CONFIG if mode == "photo" else ARTISTIC_CONFIG
    params, tmodel = _build_pair(cfg, reference_revresnet, seed=2)
    c = rng.uniform(size=(1, 32, 32, 3)).astype(np.float32)
    s = rng.uniform(size=(1, 32, 32, 3)).astype(np.float32)

    z_c = encode(params, jnp.asarray(c), cfg)
    z_s = encode(params, jnp.asarray(s), cfg)
    out_jax = np.asarray(decode(params, cwct.transfer(z_c, z_s), cfg))

    # Reference side: encode both, per-sample whitening/coloring (its
    # batched _transfer is broken — see tests/test_cwct.py), decode.
    sys.path.insert(0, "/root/reference")
    try:
        from models.cWCT import cWCT  # type: ignore
    finally:
        sys.path.remove("/root/reference")
    cw = cWCT()
    with torch.no_grad():
        tzc = tmodel(torch.from_numpy(c.transpose(0, 3, 1, 2)), forward=True)
        tzs = tmodel(torch.from_numpy(s.transpose(0, 3, 1, 2)), forward=True)
        n = tzc.shape[1]
        w = cw.whitening(tzc[0].reshape(n, -1))
        tz = cw.coloring(w, tzs[0].reshape(n, -1)).reshape(tzc.shape)
        out_t = tmodel(tz, forward=False).numpy().transpose(0, 2, 3, 1)

    np.testing.assert_allclose(out_jax, out_t, rtol=0.01, atol=0.01)
    mse = float(((out_jax - out_t) ** 2).mean())
    psnr = 10 * np.log10(1.0 / mse) if mse > 0 else float("inf")
    assert psnr >= 40.0, f"full-config stylize PSNR {psnr:.1f} dB < 40"


def test_checkpoint_roundtrip(tmp_path):
    """save (torch format) -> load -> identical pytree."""
    from vstnet_tpu.io.checkpoint import load_revresnet, save_torch_checkpoint

    params = init_revresnet(jax.random.PRNGKey(7), SMALL)
    path = str(tmp_path / "ckpt.pt")
    save_torch_checkpoint(params, path)
    params2 = load_revresnet(path)

    flat1 = jax.tree_util.tree_leaves(params)
    flat2 = jax.tree_util.tree_leaves(params2)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_native_checkpoint_roundtrip(tmp_path):
    from vstnet_tpu.io.checkpoint import load_native, save_native

    params = init_revresnet(jax.random.PRNGKey(8), SMALL)
    path = str(tmp_path / "ckpt.msgpack")
    save_native(params, path)
    params2 = load_native(path)
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params2)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
