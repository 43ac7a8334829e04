"""Parity of ops/warp.py vs torch grid_sample with the reference's
normalization (/root/reference/utils/TemporalLoss.py:13-31): sample position
p = grid - flow, normalized 2p/(S-1) - 1, grid_sample(mode='nearest',
padding_mode='border', align_corners=False)."""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from vstnet_tpu.ops.warp import flow_warp_nearest


def torch_reference_warp(x_nchw, flow_nchw, padding_mode="border"):
    """The reference warp, reproduced for the oracle (TemporalLoss.py:13-31):
    mesh grid minus flow, scaled to [-1, 1] with /(S-1), nearest sampling."""
    b, c, h, w = x_nchw.shape
    xx = torch.arange(0, w).view(1, -1).repeat(h, 1)
    yy = torch.arange(0, h).view(-1, 1).repeat(1, w)
    xx = xx.view(1, 1, h, w).repeat(b, 1, 1, 1)
    yy = yy.view(1, 1, h, w).repeat(b, 1, 1, 1)
    grid = torch.cat((xx, yy), 1).float()
    vgrid = grid - flow_nchw
    vgrid[:, 0] = 2.0 * vgrid[:, 0] / max(w - 1, 1) - 1.0
    vgrid[:, 1] = 2.0 * vgrid[:, 1] / max(h - 1, 1) - 1.0
    vgrid = vgrid.permute(0, 2, 3, 1)
    return torch.nn.functional.grid_sample(
        x_nchw, vgrid, padding_mode=padding_mode, mode="nearest",
        align_corners=False)


def _compare(x_nhwc, flow_nhwc):
    got = np.asarray(flow_warp_nearest(jnp.asarray(x_nhwc),
                                       jnp.asarray(flow_nhwc)))
    xt = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)).copy())
    ft = torch.from_numpy(np.transpose(flow_nhwc, (0, 3, 1, 2)).copy())
    ref = torch_reference_warp(xt, ft).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("h,w", [(16, 16), (17, 23), (8, 32)])
def test_warp_parity_random_flow(rng, h, w):
    x = rng.standard_normal((2, h, w, 3)).astype(np.float32)
    flow = (rng.standard_normal((2, h, w, 2)) * 5.0).astype(np.float32)
    _compare(x, flow)


def test_warp_parity_border_overflow(rng):
    """Flows pushing far outside the image exercise the border clamp."""
    h = w = 12
    x = rng.standard_normal((1, h, w, 2)).astype(np.float32)
    flow = (rng.standard_normal((1, h, w, 2)) * 40.0).astype(np.float32)
    _compare(x, flow)


def test_warp_parity_integer_and_zero_flow(rng):
    h, w = 9, 14
    x = rng.standard_normal((1, h, w, 1)).astype(np.float32)
    _compare(x, np.zeros((1, h, w, 2), np.float32))
    flow = rng.integers(-4, 5, size=(1, h, w, 2)).astype(np.float32)
    _compare(x, flow)


def test_warp_parity_subpixel_ties(rng):
    """Half-integer sample positions hit the rounding tie: both torch
    (nearbyint) and jnp.round use round-half-even, so results must still
    be bit-equal. Construct flows so p = v*S/(S-1) - 0.5 lands on x.5."""
    h = w = 8
    x = rng.standard_normal((1, h, w, 1)).astype(np.float32)
    # v such that p is exactly k + 0.5: v = (k + 1) * (S-1)/S
    ks = np.arange(h)[None, :, None]
    v = (ks + 1.0) * (h - 1.0) / h
    grid = np.arange(w)[None, None, :]
    flow = np.zeros((1, h, w, 2), np.float32)
    flow[..., 0] = grid - v  # vx = grid - flow -> v
    _compare(x, flow)
