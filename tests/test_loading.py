"""Tolerant ("foreign") checkpoint loading, the f64 Cholesky escape
hatch, and the env-gated real-checkpoint parity gate.

Reference behaviors matched:
  * skip-with-warning on missing / shape-mismatched tensors
    (/root/reference/project/ggml/include/ggml_engine.h:400-423);
  * `use_double` Cholesky fallback (/root/reference/models/cWCT.py:13).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vstnet_tpu.config import PHOTO_CONFIG, RevResNetConfig
from vstnet_tpu.io.checkpoint import (
    load_revresnet,
    revresnet_to_torch,
    save_torch_checkpoint,
    tolerant_state_dict,
)
from vstnet_tpu.models.revresnet import init_revresnet

SMALL = RevResNetConfig(n_blocks=(1, 1, 1), hidden_dim=16, sp_steps=2)


def _foreign_torch_ckpt(tmp_path, params):
    """A checkpoint with one missing tensor, one shape-mismatched tensor,
    and one extra tensor — the B5-head-into-B4 / stale-buffer cases."""
    import torch

    sd = {k: torch.from_numpy(np.array(v, copy=True))
          for k, v in revresnet_to_torch(params).items()}
    del sd["stack.0.conv.1.weight"]                       # missing
    sd["stack.1.conv.4.bias"] = torch.zeros(999)          # wrong shape
    sd["optimizer.step_count"] = torch.zeros(3)           # extra
    path = str(tmp_path / "foreign.pt")
    torch.save({"state_dict": sd}, path)
    return path


def test_strict_load_raises_on_foreign(tmp_path):
    params = init_revresnet(jax.random.PRNGKey(0), SMALL)
    path = _foreign_torch_ckpt(tmp_path, params)
    with pytest.raises(KeyError):
        load_revresnet(path)  # strict default: fail loudly


def test_tolerant_load_skips_with_warnings(tmp_path):
    params = init_revresnet(jax.random.PRNGKey(0), SMALL)
    path = _foreign_torch_ckpt(tmp_path, params)
    with pytest.warns(UserWarning) as rec:
        loaded = load_revresnet(path, strict=False, cfg=SMALL, seed=7)
    msgs = " | ".join(str(w.message) for w in rec)
    assert "missing tensor stack.0.conv.1.weight" in msgs
    assert "stack.1.conv.4.bias" in msgs and "shape" in msgs
    assert "unused tensor" in msgs

    # intact tensors loaded exactly; skipped ones hold seed-7 init values
    np.testing.assert_array_equal(
        np.asarray(loaded["stack"][2]["conv1"]["w"]),
        np.asarray(params["stack"][2]["conv1"]["w"]))
    init7 = init_revresnet(jax.random.PRNGKey(7), SMALL)
    np.testing.assert_array_equal(
        np.asarray(loaded["stack"][0]["conv1"]["w"]),
        np.asarray(init7["stack"][0]["conv1"]["w"]))
    assert not np.array_equal(
        np.asarray(loaded["stack"][0]["conv1"]["w"]),
        np.asarray(params["stack"][0]["conv1"]["w"]))


def test_tolerant_gguf_load(tmp_path):
    from vstnet_tpu.io.gguf import revresnet_from_gguf, write_gguf

    params = init_revresnet(jax.random.PRNGKey(0), SMALL)
    sd = revresnet_to_torch(params)
    del sd["stack.0.conv.1.weight"]
    sd["extra.buffer"] = np.zeros(4, np.float32)
    path = str(tmp_path / "foreign.gguf")
    write_gguf(path, sd, "f32")

    with pytest.raises(KeyError):
        revresnet_from_gguf(path)
    with pytest.warns(UserWarning):
        loaded = revresnet_from_gguf(path, strict=False, cfg=SMALL)
    np.testing.assert_allclose(
        np.asarray(loaded["stack"][1]["conv1"]["w"]),
        np.asarray(params["stack"][1]["conv1"]["w"]), atol=0)


def test_segformer_to_torch_roundtrip():
    from vstnet_tpu.models.segformer import (
        init_segformer,
        segformer_from_torch,
        segformer_to_torch,
    )

    p = init_segformer(jax.random.PRNGKey(0), depths=(1, 1, 1, 1))
    sd = segformer_to_torch(p)
    p2 = segformer_from_torch(sd)
    leaves1 = jax.tree_util.tree_leaves(p)
    leaves2 = jax.tree_util.tree_leaves(p2)
    assert len(leaves1) == len(leaves2)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_segmenter_tolerant_load(tmp_path):
    import torch

    from vstnet_tpu.models.segformer import Segmenter, init_segformer, \
        segformer_to_torch

    p = init_segformer(jax.random.PRNGKey(0), depths=(1, 1, 1, 1))
    sd = segformer_to_torch(p)
    del sd["decode_head.linear_pred.weight"]
    sd["aux_head.weight"] = np.zeros(4, np.float32)
    path = str(tmp_path / "seg_foreign.pth")
    torch.save({"state_dict": {k: torch.from_numpy(np.asarray(v))
                               for k, v in sd.items()}}, path)

    with pytest.raises(KeyError):
        Segmenter.load(path)
    with pytest.warns(UserWarning):
        seg = Segmenter.load(path, strict=False)
    # depth auto-inferred from the foreign file's keys
    assert int(seg.params["stages"][0]["blocks"]["norm1"]["g"].shape[0]) == 1


def test_vgg_tolerant_load(tmp_path):
    import torch

    from vstnet_tpu.models.vgg import init_vgg, load_vgg, vgg_to_torch

    p = init_vgg(jax.random.PRNGKey(0))
    sd = vgg_to_torch(p)
    del sd["0.weight"]
    path = str(tmp_path / "vgg_foreign.pth")
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               path)
    with pytest.raises(KeyError):
        load_vgg(path)
    with pytest.warns(UserWarning):
        loaded = load_vgg(path, strict=False)
    np.testing.assert_array_equal(np.asarray(loaded[1]["w"]),
                                  np.asarray(p[1]["w"]))


def test_cholesky_use_double_rescues_f32_failure():
    """Hilbert(10) is PSD but f32 Cholesky fails on it (pivot goes
    negative from rounding); the f64 host fallback factors it. attempts=1
    bypasses the jitter ladder so the fallback itself is exercised."""
    from vstnet_tpu.models.cwct import robust_cholesky

    n = 10
    hil = np.array([[1.0 / (i + j + 1) for j in range(n)]
                    for i in range(n)], np.float32)
    l32 = np.asarray(robust_cholesky(jnp.asarray(hil), attempts=1))
    assert not np.all(np.isfinite(l32))  # f32 alone fails (NaN poison)

    l64 = np.asarray(robust_cholesky(jnp.asarray(hil), attempts=1,
                                     use_double=True))
    assert np.all(np.isfinite(l64))
    # the host ladder may have added one small eps jitter on the diagonal
    np.testing.assert_allclose(l64 @ l64.T, hil, atol=2e-3)


def test_transfer_use_double_smoke(rng):
    from vstnet_tpu.models import cwct

    c = rng.uniform(size=(1, 8, 8, 4)).astype(np.float32)
    s = rng.uniform(size=(1, 8, 8, 4)).astype(np.float32)
    a = np.asarray(cwct.transfer(jnp.asarray(c), jnp.asarray(s)))
    b = np.asarray(cwct.transfer(jnp.asarray(c), jnp.asarray(s),
                                 use_double=True))
    # healthy covariance: fallback never triggers, results identical
    np.testing.assert_array_equal(a, b)


# ---------------------------------------------------------------------------
# Env-gated REAL-checkpoint parity gate (VSTNET_CKPT_DIR). The published
# weights are stripped from this environment (.MISSING_LARGE_BLOBS; md5
# list at /root/reference/project/image_style/models/README.md) — when a
# user provides them, this turns the >=40 dB claim from structurally
# unverifiable into a one-command check.
# ---------------------------------------------------------------------------

CKPT_DIR = os.environ.get("VSTNET_CKPT_DIR")


def _find_ckpt(*names):
    if not CKPT_DIR:
        return None
    for n in names:
        p = os.path.join(CKPT_DIR, n)
        if os.path.exists(p):
            return p
    return None


@pytest.mark.skipif(
    not _find_ckpt("photo_image.pth", "photo_image.pt",
                   "image_photo_style.pth"),
    reason="set VSTNET_CKPT_DIR to a directory holding the published "
           "reference checkpoints (photo_image.pth) to run the real-weight "
           "parity gate")
def test_real_checkpoint_full_pipeline_parity():
    """Full stylize (encode c/s -> global cWCT -> decode) on the PUBLISHED
    photo checkpoint vs the imported torch reference: >=40 dB PSNR
    (BASELINE.md gate), real weights."""
    import sys
    import types

    import torch

    from vstnet_tpu.models import cwct
    from vstnet_tpu.models.revresnet import decode, encode

    path = _find_ckpt("photo_image.pth", "photo_image.pt",
                      "image_photo_style.pth")
    cfg = PHOTO_CONFIG
    params = load_revresnet(path)

    todos = types.ModuleType("todos")
    todos.debug = types.SimpleNamespace(output_var=lambda *a, **k: None)
    sys.modules.setdefault("todos", todos)
    sys.path.insert(0, "/root/reference")
    try:
        from models.RevResNet import RevResNet  # type: ignore
        from models.cWCT import cWCT  # type: ignore
    finally:
        sys.path.remove("/root/reference")

    tmodel = RevResNet(nBlocks=list(cfg.n_blocks),
                       nStrides=list(cfg.strides),
                       nChannels=list(cfg.channels),
                       in_channel=cfg.in_channel, mult=cfg.mult,
                       hidden_dim=cfg.hidden_dim, sp_steps=cfg.sp_steps)
    sd = torch.load(path, map_location="cpu", weights_only=True)
    tmodel.load_state_dict(sd.get("state_dict", sd))
    tmodel.eval()

    rng = np.random.default_rng(0)
    c = rng.uniform(size=(1, 128, 128, 3)).astype(np.float32)
    s = rng.uniform(size=(1, 128, 128, 3)).astype(np.float32)

    z_c = encode(params, jnp.asarray(c), cfg)
    z_s = encode(params, jnp.asarray(s), cfg)
    out_jax = np.asarray(decode(params, cwct.transfer(z_c, z_s), cfg))

    tcwct = cWCT()
    with torch.no_grad():
        tz_c = tmodel(torch.from_numpy(c.transpose(0, 3, 1, 2)),
                      forward=True)
        tz_s = tmodel(torch.from_numpy(s.transpose(0, 3, 1, 2)),
                      forward=True)
        t_out = tmodel(tcwct.transfer(tz_c, tz_s, None, None),
                       forward=False)
    out_t = t_out.numpy().transpose(0, 2, 3, 1)

    mse = float(np.mean((out_jax - out_t) ** 2))
    psnr = 10 * np.log10(max(np.ptp(out_t), 1e-12) ** 2 / max(mse, 1e-20))
    assert psnr >= 40.0, f"real-checkpoint parity {psnr:.1f} dB < 40 dB"
