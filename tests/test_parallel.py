"""GSPMD parallel layer on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vstnet_tpu.config import RevResNetConfig
from vstnet_tpu.models.revresnet import init_revresnet
from vstnet_tpu.parallel import (
    make_mesh,
    make_parallel_train_step,
    parallel_stylize,
    shard_batch,
)

SMALL = RevResNetConfig(n_blocks=(1, 1, 1), hidden_dim=16, sp_steps=2)


@pytest.fixture(scope="module")
def devices_ok():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")


def test_data_parallel_stylize_matches_single(devices_ok, rng):
    params = init_revresnet(jax.random.PRNGKey(0), SMALL)
    mesh = make_mesh(8, axes=("data",))
    fn = parallel_stylize(mesh, SMALL)

    c = jnp.asarray(rng.uniform(size=(8, 16, 16, 3)), jnp.float32)
    s = jnp.asarray(rng.uniform(size=(8, 16, 16, 3)), jnp.float32)
    with mesh:
        out = fn(params, shard_batch(mesh, c), shard_batch(mesh, s))

    # single-device reference
    from vstnet_tpu.models import cwct
    from vstnet_tpu.models.revresnet import decode, encode

    z_c = encode(params, c, SMALL)
    z_s = encode(params, s, SMALL)
    ref = decode(params, cwct.transfer(z_c, z_s), SMALL)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_spatial_sharded_stylize(devices_ok, rng):
    """2D mesh: rows sharded — XLA inserts conv halo exchanges; result must
    equal the unsharded computation."""
    params = init_revresnet(jax.random.PRNGKey(1), SMALL)
    mesh = make_mesh(8, axes=("data", "spatial"), spatial=2)
    fn = parallel_stylize(mesh, SMALL, spatial=True)

    c = jnp.asarray(rng.uniform(size=(4, 16, 16, 3)), jnp.float32)
    s = jnp.asarray(rng.uniform(size=(4, 16, 16, 3)), jnp.float32)
    with mesh:
        out = fn(params, shard_batch(mesh, c, spatial=True),
                 shard_batch(mesh, s, spatial=True))

    from vstnet_tpu.models import cwct
    from vstnet_tpu.models.revresnet import decode, encode

    z_c = encode(params, c, SMALL)
    z_s = encode(params, s, SMALL)
    ref = decode(params, cwct.transfer(z_c, z_s), SMALL)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_parallel_train_step(devices_ok, rng):
    from vstnet_tpu.models.vgg import init_vgg
    from vstnet_tpu.train.losses import LossWeights
    from vstnet_tpu.train.trainer import TrainConfig, make_optimizer

    mesh = make_mesh(8, axes=("data",))
    tc = TrainConfig()
    opt = make_optimizer(tc)
    weights = LossWeights(lap=10.0, temporal=0.0)
    params = init_revresnet(jax.random.PRNGKey(2), SMALL)
    vggp = init_vgg(jax.random.PRNGKey(3))
    opt_state = opt.init(params)

    step = make_parallel_train_step(mesh, opt, SMALL, weights)
    a = jnp.asarray(rng.uniform(size=(8, 16, 16, 3)), jnp.float32)
    b = jnp.asarray(rng.uniform(size=(8, 16, 16, 3)), jnp.float32)
    flow = jnp.zeros((8, 16, 16, 2))
    noise = jnp.zeros_like(a)

    with mesh:
        p2, o2, aux = step(params, opt_state, vggp,
                           shard_batch(mesh, a), shard_batch(mesh, b),
                           flow, noise)
        jax.block_until_ready(p2)

    assert np.isfinite(float(aux["loss_total"]))
    for leaf in jax.tree_util.tree_leaves(p2):
        assert np.isfinite(np.asarray(leaf)).all()


def test_parallel_flat_step_matches_single(devices_ok, rng):
    """The flat-buffer production step over the 8-device data mesh equals
    the single-device flat step (one fused gradient all-reduce)."""
    from jax.flatten_util import ravel_pytree
    from vstnet_tpu.models.vgg import init_vgg
    from vstnet_tpu.parallel import make_parallel_flat_step
    from vstnet_tpu.train.losses import LossWeights, loss_and_grads_flat
    from vstnet_tpu.train.trainer import TrainConfig, make_optimizer
    import optax

    mesh = make_mesh(8, axes=("data",))
    tc = TrainConfig()
    opt = make_optimizer(tc)
    weights = LossWeights(lap=10.0, temporal=0.0)
    params = init_revresnet(jax.random.PRNGKey(2), SMALL)
    vggp = init_vgg(jax.random.PRNGKey(3))
    flat, unravel = ravel_pytree(params)
    opt_state = opt.init(flat)

    a = jnp.asarray(rng.uniform(size=(8, 16, 16, 3)), jnp.float32)
    b = jnp.asarray(rng.uniform(size=(8, 16, 16, 3)), jnp.float32)
    flow = jnp.zeros((8, 16, 16, 2))
    noise = jnp.zeros_like(a)

    # single-device reference first (the parallel step donates `flat`)
    grads, aux_ref = loss_and_grads_flat(
        flat, unravel, vggp, a, b, flow, noise, SMALL, weights, False)
    upd, _ = opt.update(grads, opt.init(flat), flat)
    ref = optax.apply_updates(flat, upd)

    step = make_parallel_flat_step(mesh, opt, SMALL, weights, unravel)
    with mesh:
        f2, o2, aux = step(flat, opt_state, vggp,
                           shard_batch(mesh, a), shard_batch(mesh, b),
                           shard_batch(mesh, flow),
                           shard_batch(mesh, noise))
        jax.block_until_ready(f2)
    assert np.isfinite(np.asarray(f2)).all()
    # a handful of elements see adam's step-1 m/sqrt(v) amplify sharded-
    # reduction-order noise up to the update scale (lr=1e-4); bound those
    # by atol=1e-4 and the aggregate drift much tighter
    f2n, refn = np.asarray(f2), np.asarray(ref)
    np.testing.assert_allclose(f2n, refn, rtol=1e-4, atol=1e-4)
    assert np.mean(np.abs(f2n - refn)) < 1e-6
    np.testing.assert_allclose(np.asarray(aux), np.asarray(aux_ref),
                               rtol=1e-4, atol=2e-5)


def test_parallel_fused_stylize_matches_single(rng, monkeypatch):
    """The flagship composition: fused bf16 flat-Pallas stylize sharded
    over the data axis (shard_map) equals the single-device fused path.
    Pallas runs in interpret mode on the CPU mesh, exactly as the
    fast-path parity tests do."""
    import vstnet_tpu.ops.coupling_flat as cflat
    import vstnet_tpu.models.revresnet_fast as rf
    from vstnet_tpu.models import cwct
    from vstnet_tpu.parallel import parallel_stylize_fused

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    from tests.conftest import patch_interpret_fused

    patch_interpret_fused(monkeypatch)

    params = init_revresnet(jax.random.PRNGKey(5), SMALL)
    fast = rf.pack_revresnet(params, SMALL)  # f32 on CPU: exact comparison
    c_lat = SMALL.latent_channels

    frames = jnp.asarray(rng.uniform(size=(8, 16, 16, 3)), jnp.float32)
    style = jnp.asarray(rng.uniform(size=(1, 16, 16, 3)), jnp.float32)
    zs = rf.encode_fast(fast, style, SMALL, packed_latent=True)
    ls, mu_s = cwct.style_factors_packed(zs, c_lat)

    # single-device fused reference
    zp = rf.encode_fast(fast, frames, SMALL, packed_latent=True)
    z_cs = cwct.transfer_with_factors_packed(zp, ls, mu_s, c_lat)
    ref = np.clip(np.asarray(
        rf.decode_fast(fast, z_cs, SMALL, packed_latent=True)), 0.0, 1.0)

    mesh = make_mesh(8, axes=("data",))
    fn = parallel_stylize_fused(mesh, SMALL)
    with mesh:
        out = fn(fast, shard_batch(mesh, frames), ls, mu_s)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)

    # uint8 variant: same pixels, device-side pack
    fn8 = parallel_stylize_fused(mesh, SMALL, out_u8=True)
    with mesh:
        out8 = fn8(fast, shard_batch(mesh, frames), ls, mu_s)
    assert out8.dtype == jnp.uint8
    np.testing.assert_allclose(np.asarray(out8),
                               np.round(ref * 255.0).astype(np.uint8),
                               atol=1)

    # interp variant (--alpha_c over the mesh): traced alpha, sharded ==
    # single-device interp_with_factors_packed
    alpha = jnp.float32(0.4)
    zi = cwct.interp_with_factors_packed(zp, ls, mu_s, alpha, c_lat)
    ref_i = np.clip(np.asarray(
        rf.decode_fast(fast, zi, SMALL, packed_latent=True)), 0.0, 1.0)
    fni = parallel_stylize_fused(mesh, SMALL, interp=True)
    with mesh:
        outi = fni(fast, shard_batch(mesh, frames), ls, mu_s, alpha)
    np.testing.assert_allclose(np.asarray(outi), ref_i, rtol=2e-5,
                               atol=2e-5)


def test_parallel_masked_fused_matches_single(rng, monkeypatch):
    """The masked (auto-seg) video program sharded over 'data' — in-graph
    segment -> composed video_remap -> fused encode -> factored regional
    cWCT -> fused decode — equals the same chain on one device. Pallas in
    interpret mode; a depth-(1,1,1,1) segmenter keeps the CPU compile
    small."""
    import vstnet_tpu.ops.coupling_flat as cflat
    import vstnet_tpu.models.revresnet_fast as rf
    from vstnet_tpu.models import cwct
    from vstnet_tpu.models.remapping import (
        load_label_mapping,
        self_remapping,
        video_remap,
        video_remap_plan,
    )
    from vstnet_tpu.models.segformer import init_segformer, segment_mask
    from vstnet_tpu.parallel import parallel_stylize_masked_fused

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    from tests.conftest import patch_interpret_fused

    patch_interpret_fused(monkeypatch)

    params = init_revresnet(jax.random.PRNGKey(5), SMALL)
    fast = rf.pack_revresnet(params, SMALL)  # f32 on CPU: exact comparison
    seg_params = init_segformer(jax.random.PRNGKey(6), depths=(1, 1, 1, 1))
    mapping = load_label_mapping()

    frames = jnp.asarray(rng.uniform(size=(8, 16, 16, 3)), jnp.float32)
    style = jnp.asarray(rng.uniform(size=(1, 16, 16, 3)), jnp.float32)

    smask = self_remapping(segment_mask(seg_params, style), mapping, 0.02)
    z_s = rf.encode_fast(fast, style, SMALL)
    style_region = cwct.style_region_factors(z_s, smask, max_labels=8)
    remap_plan = video_remap_plan(smask, mapping)

    # single-device reference of the identical chain (half=True is the
    # masked program's default segmenter precision)
    cm_ref = segment_mask(seg_params, frames, half=True)
    cm_ref = video_remap(cm_ref, *remap_plan, mapping, 0.02)
    z_c = rf.encode_fast(fast, frames, SMALL)
    z_cs = cwct.transfer_masked_factored(z_c, cm_ref, *style_region)
    ref = np.clip(np.asarray(rf.decode_fast(fast, z_cs, SMALL)), 0.0, 1.0)

    mesh = make_mesh(8, axes=("data",))
    fn = parallel_stylize_masked_fused(mesh, SMALL, min_ratio=0.02)
    with mesh:
        out, cm = fn(fast, seg_params, mapping, style_region, remap_plan,
                     shard_batch(mesh, frames))
    np.testing.assert_array_equal(np.asarray(cm), np.asarray(cm_ref))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)

    # --seg_size variant: segmenter runs at 8x8, masks come back upsampled
    # to frame resolution and the program stays finite/valid
    fn_s = parallel_stylize_masked_fused(mesh, SMALL, min_ratio=0.02,
                                         seg_hw=(8, 8))
    with mesh:
        out_s, cm_s = fn_s(fast, seg_params, mapping, style_region,
                           remap_plan, shard_batch(mesh, frames))
    assert cm_s.shape == (8, 16, 16) and out_s.shape == frames.shape
    assert np.isfinite(np.asarray(out_s)).all()
    assert np.asarray(cm_s).min() >= 0


def test_parallel_flat_step_sequence_and_bf16(devices_ok, rng):
    """N data-parallel steps track the single-device flat trainer, and the
    signature-compatible step serves bf16 + temporal-phase variants (the
    trainer swaps make_flat_step for this one under --data_parallel)."""
    import optax
    from jax.flatten_util import ravel_pytree
    from vstnet_tpu.models.vgg import init_vgg
    from vstnet_tpu.parallel import make_parallel_flat_step
    from vstnet_tpu.train.losses import LossWeights, loss_and_grads_flat
    from vstnet_tpu.train.trainer import TrainConfig, make_optimizer

    mesh = make_mesh(8, axes=("data",))
    tc = TrainConfig()
    opt = make_optimizer(tc)
    weights = LossWeights(lap=10.0, temporal=60.0)
    params = init_revresnet(jax.random.PRNGKey(4), SMALL)
    vggp = init_vgg(jax.random.PRNGKey(5))
    flat0, unravel = ravel_pytree(params)
    flat0_np = np.asarray(flat0)  # the parallel step DONATES its input

    batches = [
        (jnp.asarray(rng.uniform(size=(8, 16, 16, 3)), jnp.float32),
         jnp.asarray(rng.uniform(size=(8, 16, 16, 3)), jnp.float32))
        for _ in range(3)
    ]
    flow = jnp.zeros((8, 16, 16, 2))
    noise = jnp.zeros((8, 16, 16, 3))

    # single-device reference sequence
    ref = np.asarray(flat0)
    ref_state = opt.init(flat0)
    for a, b in batches:
        g, _ = loss_and_grads_flat(jnp.asarray(ref), unravel, vggp, a, b,
                                   flow, noise, SMALL, weights, False)
        upd, ref_state = opt.update(g, ref_state, jnp.asarray(ref))
        ref = np.asarray(optax.apply_updates(jnp.asarray(ref), upd))

    step = make_parallel_flat_step(mesh, opt, SMALL, weights, unravel)
    f = jnp.asarray(flat0_np)
    st = opt.init(f)
    with mesh:
        for a, b in batches:
            f, st, aux = step(f, st, vggp, shard_batch(mesh, a),
                              shard_batch(mesh, b), shard_batch(mesh, flow),
                              shard_batch(mesh, noise))
        jax.block_until_ready(f)
    np.testing.assert_allclose(np.asarray(f), ref, rtol=1e-4, atol=3e-4)
    assert np.mean(np.abs(np.asarray(f) - ref)) < 1e-5

    # bf16 + temporal-phase step: runs, stays finite, grads flow
    step16 = make_parallel_flat_step(mesh, opt, SMALL, weights, unravel,
                                     compute_dtype=jnp.bfloat16)
    a, b = batches[0]
    fl = jnp.asarray(rng.normal(size=(8, 16, 16, 2)) * 2, jnp.float32)
    nz = jnp.asarray(rng.normal(size=(8, 16, 16, 3)) * 1e-3, jnp.float32)
    f0 = jnp.asarray(flat0_np)
    with mesh:
        f2, _, aux = step16(f0, opt.init(f0), vggp,
                            shard_batch(mesh, a), shard_batch(mesh, b),
                            shard_batch(mesh, fl), shard_batch(mesh, nz),
                            True)
        jax.block_until_ready(f2)
    assert np.isfinite(np.asarray(f2)).all()
    assert not np.allclose(np.asarray(f2), flat0_np)


# ---------------------------------------------------------------------------
# Multi-host scaffolding (structure-level: multi-process execution can't run
# here, so the deterministic logic is exercised single-process, the way the
# 8-virtual-device mesh stands in for 8 chips)
# ---------------------------------------------------------------------------

def test_multihost_init_noop_without_env(monkeypatch):
    from vstnet_tpu.parallel.multihost import init_distributed

    for var in ("VSTNET_COORDINATOR", "VSTNET_NUM_PROCESSES",
                "VSTNET_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    assert init_distributed() is False  # explicit opt-in required


def test_multihost_batch_bounds():
    from vstnet_tpu.parallel.multihost import process_batch_bounds

    # simulated 4-process pod: contiguous equal slices covering the batch
    bounds = [process_batch_bounds(32, 4, p) for p in range(4)]
    assert bounds == [(0, 8), (8, 16), (16, 24), (24, 32)]
    with pytest.raises(ValueError):
        process_batch_bounds(30, 4, 0)  # not divisible
    with pytest.raises(ValueError):
        process_batch_bounds(32, 4, 4)  # pid out of range
    # single-process (this environment): identity slice
    assert process_batch_bounds(16) == (0, 16)


def test_multihost_local_to_global_matches_shard_batch(devices_ok, rng):
    from vstnet_tpu.parallel.multihost import (
        global_mesh,
        host_local_to_global,
    )

    mesh = global_mesh(axes=("data",))
    assert mesh.devices.size == len(jax.devices())
    x = rng.uniform(size=(16, 4, 4, 3)).astype(np.float32)
    a = host_local_to_global(mesh, x)  # 1 process: local rows == global
    b = shard_batch(mesh, x)
    assert a.sharding.is_equivalent_to(b.sharding, a.ndim)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
