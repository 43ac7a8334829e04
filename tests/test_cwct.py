"""cWCT: statistical-correctness checks and parity vs the reference torch
implementation (imported read-only from /root/reference)."""

import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from vstnet_tpu.models.cwct import (
    interpolation,
    robust_cholesky,
    transfer,
    transfer_masked,
)


@pytest.fixture(scope="module")
def reference_cwct():
    todos = types.ModuleType("todos")
    todos.debug = types.SimpleNamespace(output_var=lambda *a, **k: None)
    sys.modules.setdefault("todos", todos)
    sys.path.insert(0, "/root/reference")
    try:
        from models.cWCT import cWCT  # type: ignore
    finally:
        sys.path.remove("/root/reference")
    return cWCT()


def _nhwc(x_nchw):
    return np.transpose(x_nchw, (0, 2, 3, 1))


def test_robust_cholesky_psd(rng):
    a = rng.standard_normal((32, 64)).astype(np.float32)
    cov = a @ a.T / 63
    l = np.asarray(robust_cholesky(jnp.asarray(cov)))
    np.testing.assert_allclose(l @ l.T, cov, atol=1e-4)


def test_robust_cholesky_degenerate():
    # Rank-deficient covariance: must still return a finite factor.
    cov = jnp.zeros((8, 8))
    l = np.asarray(robust_cholesky(cov))
    assert np.isfinite(l).all()


def test_robust_cholesky_failure_propagates_nan():
    """Reference contract (cWCT.py:127-128): after exhausting eps
    escalation, the failure must surface — NaN poisoning + host raise,
    never a silent identity fallback."""
    from vstnet_tpu.models.cwct import host_check_finite

    cov = jnp.full((8, 8), jnp.nan)
    l = np.asarray(robust_cholesky(cov))
    assert np.isnan(l).all()
    with pytest.raises(FloatingPointError):
        host_check_finite(l)


def test_label_capacity_buckets():
    from vstnet_tpu.models.cwct import label_capacity

    assert label_capacity(np.zeros((1, 4, 4), np.int32)) == 8
    m = np.arange(40, dtype=np.int32).reshape(1, 5, 8)
    assert label_capacity(m) == 64
    m = np.arange(200, dtype=np.int32).reshape(1, 10, 20)
    assert label_capacity(m) == 200
    assert label_capacity(None, np.zeros((1, 2, 2), np.int32)) == 8


def test_transfer_matches_style_statistics(rng):
    """After transfer, output mean/cov must equal style mean/cov (the
    defining property of WCT)."""
    xc = rng.standard_normal((1, 16, 16, 8)).astype(np.float32)
    xs = (rng.standard_normal((1, 20, 12, 8)) * 2.0 + 1.0).astype(np.float32)
    y = np.asarray(transfer(jnp.asarray(xc), jnp.asarray(xs)))

    yf = y.reshape(-1, 8)
    sf = xs.reshape(-1, 8)
    np.testing.assert_allclose(yf.mean(0), sf.mean(0), atol=1e-3)
    np.testing.assert_allclose(
        np.cov(yf.T), np.cov(sf.T), atol=5e-3
    )


def test_transfer_parity_reference(reference_cwct, rng):
    """Parity vs the reference whitening+coloring math.

    Note: the reference snapshot's batched `_transfer` crashes for any B
    (models/cWCT.py:144 uses x.transpose(1, 0) on a 3D tensor — a delldu
    regression; upstream used transpose(-1,-2)). We therefore drive the
    reference's 2D per-sample whitening/coloring directly, which is the
    math `_transfer` composes (and what the seg path uses).
    """
    c = rng.standard_normal((2, 16, 24, 20)).astype(np.float32)  # NCHW
    s = rng.standard_normal((2, 16, 10, 14)).astype(np.float32)

    refs = []
    for i in range(2):
        xc = torch.from_numpy(c[i].reshape(16, -1))
        xs = torch.from_numpy(s[i].reshape(16, -1))
        with torch.no_grad():
            w = reference_cwct.whitening(xc)
            refs.append(
                reference_cwct.coloring(w, xs).numpy().reshape(16, 24, 20)
            )
    ref = np.stack(refs)

    ours = np.asarray(
        transfer(jnp.asarray(_nhwc(c)), jnp.asarray(_nhwc(s)))
    )
    np.testing.assert_allclose(ours, _nhwc(ref), rtol=1e-3, atol=1e-3)


def test_transfer_masked_parity_reference(reference_cwct, rng):
    c = rng.standard_normal((1, 8, 24, 20)).astype(np.float32)
    s = rng.standard_normal((1, 8, 20, 16)).astype(np.float32)
    # 3 regions, one (label 2) too small in style -> should pass through
    cmask = np.zeros((1, 24, 20), np.int32)
    cmask[:, 12:, :] = 1
    cmask[:, :3, :4] = 2
    smask = np.zeros((1, 20, 16), np.int32)
    smask[:, 10:, :] = 1
    smask[:, 0, 0] = 2  # 1 pixel only -> invalid region

    # NB: the reference's _transfer_seg writes through a reshape VIEW of the
    # input tensor (cWCT.py:63,104), mutating c in place — hand it a copy.
    ref = reference_cwct.transfer(
        torch.from_numpy(c.copy()), torch.from_numpy(s), cmask, smask
    ).numpy()

    ours = np.asarray(
        transfer_masked(
            jnp.asarray(_nhwc(c)),
            jnp.asarray(_nhwc(s)),
            jnp.asarray(cmask),
            jnp.asarray(smask),
        )
    )
    np.testing.assert_allclose(ours, _nhwc(ref), rtol=1e-3, atol=1e-3)


def test_transfer_masked_many_regions_parity(reference_cwct, rng):
    """>32 distinct labels (ADE20K auto-seg can exceed 32 pre-remap): with
    capacity from label_capacity, every region must be transferred — parity
    vs the reference per-label loop (models/cWCT.py:70-103), no drops."""
    from vstnet_tpu.models.cwct import label_capacity

    c = rng.standard_normal((1, 8, 48, 36)).astype(np.float32)
    s = rng.standard_normal((1, 8, 48, 36)).astype(np.float32)
    # 6x6 grid -> 36 regions of 48 px each (> MIN_PIXELS)
    blocks = np.arange(36, dtype=np.int32).reshape(6, 6)
    mask = np.kron(blocks, np.ones((8, 6), np.int32))[None]

    # copy: the reference mutates its content input in place (cWCT.py:63,104)
    ref = reference_cwct.transfer(
        torch.from_numpy(c.copy()), torch.from_numpy(s), mask, mask
    ).numpy()

    k = label_capacity(mask)
    assert k == 64
    ours = np.asarray(
        transfer_masked(
            jnp.asarray(_nhwc(c)), jnp.asarray(_nhwc(s)),
            jnp.asarray(mask), jnp.asarray(mask), max_labels=k,
        )
    )
    assert np.isfinite(ours).all()
    np.testing.assert_allclose(ours, _nhwc(ref), rtol=1e-3, atol=1e-3)
    # and with the old default capacity 32, label 35 WOULD have been dropped
    dropped = np.asarray(
        transfer_masked(
            jnp.asarray(_nhwc(c)), jnp.asarray(_nhwc(s)),
            jnp.asarray(mask), jnp.asarray(mask), max_labels=32,
        )
    )
    assert not np.allclose(dropped, _nhwc(ref), rtol=1e-3, atol=1e-3)


def test_transfer_masked_invalid_regions_passthrough(rng):
    """A mask whose labels are all invalid must return the content latent."""
    c = rng.standard_normal((1, 6, 6, 4)).astype(np.float32)
    s = rng.standard_normal((1, 6, 6, 4)).astype(np.float32)
    cmask = np.arange(36, dtype=np.int32).reshape(1, 6, 6)  # every label 1px
    smask = np.zeros((1, 6, 6), np.int32) + 99

    out = np.asarray(
        transfer_masked(
            jnp.asarray(c), jnp.asarray(s), jnp.asarray(cmask), jnp.asarray(smask),
            max_labels=40,
        )
    )
    np.testing.assert_allclose(out, c, atol=1e-6)


def test_transfer_masked_factored_matches_unfactored(rng):
    """The masked-video fast path precomputes the style side once
    (style_region_factors) and runs content-only moments per frame
    (transfer_masked_factored). When every content label appears in the
    style label set — what cross_remapping guarantees — the result must
    match transfer_masked."""
    from vstnet_tpu.models.cwct import (
        style_region_factors,
        transfer_masked_factored,
    )

    b, h, w, c = 3, 12, 12, 8
    style_labels = np.array([2, 9, 21, 76], np.int32)
    xc = rng.standard_normal((b, h, w, c)).astype(np.float32)
    xs1 = rng.standard_normal((1, h, w, c)).astype(np.float32)
    r = np.random.default_rng(5)
    # content labels drawn FROM the style label set (post-cross-remap
    # invariant); per-frame subsets differ
    cm = r.choice(style_labels, size=(b, h, w)).astype(np.int32)
    sm1 = r.choice(style_labels, size=(1, h, w)).astype(np.int32)

    labels, ns, mean_s, cov_s = style_region_factors(
        jnp.asarray(xs1), jnp.asarray(sm1), max_labels=8)
    got = np.asarray(transfer_masked_factored(
        jnp.asarray(xc), jnp.asarray(cm), labels, ns, mean_s, cov_s))

    xs_b = np.broadcast_to(xs1, (b, h, w, c))
    sm_b = np.broadcast_to(sm1, (b, h, w))
    want = np.asarray(transfer_masked(
        jnp.asarray(xc), jnp.asarray(xs_b), jnp.asarray(cm),
        jnp.asarray(sm_b), max_labels=8))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_region_moments_bf16_exact(rng):
    """Moments of a bf16 latent computed in bf16 single-pass form (what
    the fused masked path runs) must equal the f32 HIGHEST computation on
    the upcast data: one-hot weights never round, and bf16 products
    accumulate exactly in f32."""
    from vstnet_tpu.models.cwct import region_moments

    x16 = jnp.asarray(
        rng.standard_normal((500, 8)), jnp.float32).astype(jnp.bfloat16)
    m = jnp.asarray(rng.integers(0, 5, size=(500,)), jnp.int32)
    labels = jnp.arange(5, dtype=jnp.int32)

    cnt16, sm16, gm16 = region_moments(x16, m, labels, chunk=128)
    cnt32, sm32, gm32 = region_moments(
        x16.astype(jnp.float32), m, labels, chunk=128)
    np.testing.assert_array_equal(np.asarray(cnt16), np.asarray(cnt32))
    np.testing.assert_allclose(np.asarray(sm16), np.asarray(sm32),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gm16), np.asarray(gm32),
                               rtol=1e-6, atol=1e-6)


def test_transfer_masked_factored_foreign_labels_passthrough(rng):
    """Content labels absent from the style label set (the rare
    cross-remap fallback case) must pass through as content — the same
    outcome transfer_masked's ns=0 invalidity produces."""
    from vstnet_tpu.models.cwct import (
        style_region_factors,
        transfer_masked_factored,
    )

    h = w = 10
    xc = rng.standard_normal((1, h, w, 4)).astype(np.float32)
    xs1 = rng.standard_normal((1, h, w, 4)).astype(np.float32)
    cm = np.full((1, h, w), 137, np.int32)  # not in the style set
    sm1 = np.zeros((1, h, w), np.int32) + 3

    labels, ns, mean_s, cov_s = style_region_factors(
        jnp.asarray(xs1), jnp.asarray(sm1), max_labels=8)
    out = np.asarray(transfer_masked_factored(
        jnp.asarray(xc), jnp.asarray(cm), labels, ns, mean_s, cov_s))
    np.testing.assert_allclose(out, xc, atol=1e-6)


def test_interpolation_parity_reference(reference_cwct, rng):
    c = rng.standard_normal((1, 8, 16, 12)).astype(np.float32)
    s_list = [
        rng.standard_normal((1, 8, 10, 10)).astype(np.float32) for _ in range(3)
    ]
    alphas = [0.5, 0.3, 0.2]

    ref = reference_cwct.interpolation(
        torch.from_numpy(c),
        [torch.from_numpy(s) for s in s_list],
        alphas,
        alpha_c=0.4,
    ).numpy()

    ours = np.asarray(
        interpolation(
            jnp.asarray(_nhwc(c)),
            [jnp.asarray(_nhwc(s)) for s in s_list],
            jnp.asarray(alphas),
            alpha_c=0.4,
        )
    )
    np.testing.assert_allclose(ours, _nhwc(ref), rtol=1e-3, atol=1e-3)


def test_interpolation_alpha1_equals_transfer(rng):
    """interpolation([style], [1.0], alpha_c=0) == plain transfer."""
    c = rng.standard_normal((1, 8, 8, 6)).astype(np.float32)
    s = rng.standard_normal((1, 8, 8, 6)).astype(np.float32)
    a = np.asarray(transfer(jnp.asarray(c), jnp.asarray(s)))
    b = np.asarray(
        interpolation(jnp.asarray(c), [jnp.asarray(s)], jnp.asarray([1.0]))
    )
    np.testing.assert_allclose(a, b, atol=1e-4)
