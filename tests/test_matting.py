"""Matrix-free Matting Laplacian vs the reference's scipy sparse build."""

import importlib.util

import jax.numpy as jnp
import numpy as np
import pytest
import torch


def _load_ref():
    # The reference module imports cv2 only for file loading. Use the real
    # cv2 when importable; stub it ONLY if genuinely absent — and never by
    # leaving an empty module in sys.modules (an early empty stub poisons
    # `import cv2` for every later test in the process: io/video.py's mp4
    # writer saw `module 'cv2' has no attribute 'VideoWriter'`).
    import sys
    import types

    try:
        import cv2  # noqa: F401
    except ImportError:
        if "cv2" not in sys.modules:
            sys.modules["cv2"] = types.ModuleType("cv2")
    spec = importlib.util.spec_from_file_location(
        "ref_matting", "/root/reference/utils/MattingLaplacian.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    return _load_ref()


def test_quadform_matches_sparse_reference(ref, rng):
    h, w = 24, 20
    img01 = rng.uniform(size=(h, w, 3)).astype(np.float64)
    img255 = (img01 * 255.0)  # reference divides by 255 internally

    L = ref.compute_laplacian(img255, win_rad=1)  # scipy coo, float32
    Ld = torch.sparse_coo_tensor(
        np.vstack([L.row, L.col]), L.data, L.shape
    ).to_dense().numpy()

    x = rng.standard_normal((h, w, 3)).astype(np.float32)
    want = sum(
        x[..., c].reshape(1, -1) @ Ld @ x[..., c].reshape(-1, 1)
        for c in range(3)
    ).item()

    from vstnet_tpu.ops.matting import matting_laplacian_quadform

    got = float(
        matting_laplacian_quadform(
            jnp.asarray(img01[None], jnp.float32), jnp.asarray(x[None])
        )[0]
    )
    np.testing.assert_allclose(got, want, rtol=2e-3)


def test_loss_grad_matches_reference(ref, rng):
    h, w = 16, 16
    img01 = rng.uniform(size=(h, w, 3)).astype(np.float64)
    L = ref.compute_laplacian(img01 * 255.0, win_rad=1)
    indices = torch.from_numpy(np.vstack([L.row, L.col])).long()
    Lt = torch.sparse_coo_tensor(indices, torch.from_numpy(L.data), L.shape)

    x = rng.standard_normal((3, h, w)).astype(np.float32)  # CHW like torch
    ref_loss, ref_grad = ref.laplacian_loss_grad(torch.from_numpy(x), Lt)

    from vstnet_tpu.ops.matting import matting_loss_and_grad

    loss, grad = matting_loss_and_grad(
        jnp.asarray(img01[None], jnp.float32),
        jnp.asarray(x.transpose(1, 2, 0)[None]),
    )
    np.testing.assert_allclose(float(loss[0]), float(ref_loss), rtol=2e-3)
    np.testing.assert_allclose(
        np.asarray(grad[0]),
        ref_grad.numpy().transpose(1, 2, 0),
        rtol=2e-3, atol=1e-4,
    )


def test_constant_in_nullspace(rng):
    """L annihilates constant images: x = const -> x^T L x ~ 0."""
    from vstnet_tpu.ops.matting import matting_laplacian_quadform

    img = jnp.asarray(rng.uniform(size=(1, 20, 20, 3)), jnp.float32)
    x = jnp.ones((1, 20, 20, 3))
    q = float(matting_laplacian_quadform(img, x)[0])
    assert abs(q) < 1e-3
