"""VGG parity, loss step, and a short end-to-end training run."""

import importlib.util
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from vstnet_tpu.config import RevResNetConfig
from vstnet_tpu.models.vgg import (
    calc_mean_std,
    init_vgg,
    vgg_features,
    vgg_from_torch,
    vgg_losses,
)

SMALL = RevResNetConfig(n_blocks=(1, 1, 1), hidden_dim=16, sp_steps=2)


@pytest.fixture(scope="module")
def ref_vgg_module():
    spec = importlib.util.spec_from_file_location(
        "ref_vgg", "/root/reference/models/VGG.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_vgg_feature_parity(ref_vgg_module, rng):
    torch.manual_seed(0)
    tvgg = ref_vgg_module.build_vgg()
    tvgg.eval()
    sd = {k: v.detach().numpy() for k, v in tvgg.state_dict().items()}
    params = vgg_from_torch(sd)

    x = rng.uniform(size=(1, 33, 37, 3)).astype(np.float32)  # odd dims: ceil pool
    feats = vgg_features(params, jnp.asarray(x), n_layer=5)

    # reference slicing: enc_i boundaries at [:4],[4:11],[11:18],[18:31],[31:45]
    layers = list(tvgg.children())
    bounds = [(0, 4), (4, 11), (11, 18), (18, 31), (31, 44)]
    t = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        for i, (a, b) in enumerate(bounds):
            for m in layers[a:b]:
                t = m(t)
            ours = np.asarray(feats[i])
            theirs = t.numpy().transpose(0, 2, 3, 1)
            assert ours.shape == theirs.shape, f"layer {i}"
            np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4,
                                       err_msg=f"relu{i+1}_1 mismatch")


def test_vgg_loss_parity(ref_vgg_module, rng):
    """Style/content losses match the reference formulas."""
    torch.manual_seed(1)
    tvgg = ref_vgg_module.build_vgg()
    sd = {k: v.detach().numpy() for k, v in tvgg.state_dict().items()}
    params = vgg_from_torch(sd)

    a = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
    b = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
    s = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)

    loss_c, loss_s = vgg_losses(params, jnp.asarray(a), jnp.asarray(b),
                                jnp.asarray(s), content_weight=1.0)

    # reference: VGG19 uses the same Sequential weights
    class _V(ref_vgg_module.VGG19):
        def __init__(self, vgg):
            torch.nn.Module.__init__(self)
            layers = list(vgg.children())
            self.enc_1 = torch.nn.Sequential(*layers[:4])
            self.enc_2 = torch.nn.Sequential(*layers[4:11])
            self.enc_3 = torch.nn.Sequential(*layers[11:18])
            self.enc_4 = torch.nn.Sequential(*layers[18:31])
            self.enc_5 = torch.nn.Sequential(*layers[31:45])
            self.mse_loss = torch.nn.MSELoss()

    v = _V(tvgg)
    with torch.no_grad():
        rc, rs = v(
            torch.from_numpy(a.transpose(0, 3, 1, 2)),
            torch.from_numpy(b.transpose(0, 3, 1, 2)),
            torch.from_numpy(s.transpose(0, 3, 1, 2)),
            n_layer=4, content_weight=1.0,
        )
    np.testing.assert_allclose(float(loss_s), float(rs), rtol=1e-3)
    np.testing.assert_allclose(float(loss_c), float(rc), rtol=1e-3)


def test_calc_mean_std_matches_torch(rng):
    x = rng.standard_normal((2, 8, 8, 16)).astype(np.float32)
    m, s = calc_mean_std(jnp.asarray(x))
    t = torch.from_numpy(x.transpose(0, 3, 1, 2))
    var = t.view(2, 16, -1).var(dim=2) + 1e-5
    np.testing.assert_allclose(np.asarray(m), t.view(2, 16, -1).mean(2).numpy(),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(s), var.sqrt().numpy(), atol=1e-4)


def test_train_step_decreases_loss(rng, tmp_path):
    """A few steps on fixed synthetic data: loss drops, params stay finite."""
    from vstnet_tpu.train.losses import LossWeights
    from vstnet_tpu.train.trainer import (
        TrainConfig,
        init_train_state,
        train_step,
    )

    tc = TrainConfig(mode="photorealistic", batch_size=2,
                     weights=LossWeights(lap=10.0, temporal=0.0))

    # small architecture for CPU speed; drive losses directly with SMALL cfg
    from vstnet_tpu.models.revresnet import init_revresnet
    from vstnet_tpu.train.trainer import TrainState, make_optimizer

    params = init_revresnet(jax.random.PRNGKey(0), SMALL)
    opt = make_optimizer(tc)
    state = TrainState(params=params, opt_state=opt.init(params))

    vgg_params = init_vgg(jax.random.PRNGKey(1))
    a = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)), jnp.float32)
    b = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)), jnp.float32)

    # patch cfg: call losses directly with SMALL
    from vstnet_tpu.train.losses import loss_and_grads
    import optax

    losses = []
    for _ in range(5):
        grads, aux = loss_and_grads(
            state.params, vgg_params, a, b,
            jnp.zeros((2, 32, 32, 2)), jnp.zeros_like(a),
            SMALL, tc.weights, False,
        )
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        state = TrainState(optax.apply_updates(state.params, updates),
                           opt_state, state.step + 1)
        losses.append(float(aux["loss_total"]))

    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_temporal_phase_step(rng):
    """The temporal fine-tune step runs and produces finite grads."""
    from vstnet_tpu.train.losses import LossWeights, loss_and_grads

    params_key = jax.random.PRNGKey(2)
    from vstnet_tpu.models.revresnet import init_revresnet

    params = init_revresnet(params_key, SMALL)
    vgg_params = init_vgg(jax.random.PRNGKey(3))
    a = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
    b = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
    flow = jnp.asarray(rng.normal(size=(1, 32, 32, 2)) * 2, jnp.float32)
    noise = jnp.asarray(rng.normal(size=a.shape) * 1e-3, jnp.float32)

    grads, aux = loss_and_grads(
        params, vgg_params, a, b, flow, noise, SMALL,
        LossWeights(lap=0.0), temporal_phase=True,
    )
    assert float(aux["loss_tmp"]) > 0
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()


def test_checkpoint_resume_roundtrip(tmp_path):
    from vstnet_tpu.train.trainer import (
        TrainConfig,
        TrainState,
        load_checkpoint,
        make_optimizer,
        save_checkpoint,
    )
    from vstnet_tpu.models.revresnet import init_revresnet
    from vstnet_tpu.config import PHOTO_CONFIG

    tc = TrainConfig()
    params = init_revresnet(jax.random.PRNGKey(0), PHOTO_CONFIG)
    opt = make_optimizer(tc)
    state = TrainState(params, opt.init(params), step=123)
    save_checkpoint(state, str(tmp_path))

    state2, _ = load_checkpoint(tc, str(tmp_path))
    assert state2.step == 123
    for x, y in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_flat_step_matches_tree_step(rng):
    """The flat-buffer production step (one raveled master vector,
    elementwise Adam) reproduces the tree-based reference step exactly."""
    import optax
    from jax.flatten_util import ravel_pytree
    from vstnet_tpu.models.revresnet import init_revresnet
    from vstnet_tpu.train.losses import (
        AUX_KEYS, LossWeights, loss_and_grads, loss_and_grads_flat)
    from vstnet_tpu.train.trainer import TrainConfig, make_optimizer

    tc = TrainConfig(weights=LossWeights(lap=10.0, temporal=0.0))
    params = init_revresnet(jax.random.PRNGKey(0), SMALL)
    vgg_params = init_vgg(jax.random.PRNGKey(1))
    a = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)), jnp.float32)
    b = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)), jnp.float32)
    flow = jnp.zeros((2, 32, 32, 2))
    noise = jnp.zeros_like(a)

    grads, aux = loss_and_grads(
        params, vgg_params, a, b, flow, noise, SMALL, tc.weights, False)
    flat, unravel = ravel_pytree(params)
    fgrads, aux_stack = loss_and_grads_flat(
        flat, unravel, vgg_params, a, b, flow, noise, SMALL, tc.weights,
        False)

    ref_flat, _ = ravel_pytree(grads)
    np.testing.assert_allclose(np.asarray(fgrads), np.asarray(ref_flat),
                               rtol=2e-5, atol=2e-6)
    for k, v in zip(AUX_KEYS, aux_stack):
        np.testing.assert_allclose(float(v), float(aux[k]), rtol=1e-4,
                                   atol=2e-5)

    # one optimizer step each way -> identical updated parameters
    opt = make_optimizer(tc)
    upd, _ = opt.update(grads, opt.init(params), params)
    tree_next, _ = ravel_pytree(optax.apply_updates(params, upd))
    fupd, _ = opt.update(fgrads, opt.init(flat), flat)
    flat_next = optax.apply_updates(flat, fupd)
    # atol ~ 0.1*lr: adam's m/sqrt(v) at step 1 amplifies reduction-order
    # noise in tiny grads; updates per step are bounded by lr=1e-4
    np.testing.assert_allclose(np.asarray(flat_next), np.asarray(tree_next),
                               rtol=2e-5, atol=1e-5)


def test_bf16_mixed_precision_step(rng):
    """bf16 compute path: grads return f32 (master-weight pattern),
    losses stay finite, and the gradient direction agrees with f32."""
    from jax.flatten_util import ravel_pytree
    from vstnet_tpu.models.revresnet import init_revresnet
    from vstnet_tpu.train.losses import LossWeights, loss_and_grads_flat

    w = LossWeights(lap=10.0, temporal=0.0)
    params = init_revresnet(jax.random.PRNGKey(0), SMALL)
    vgg_params = init_vgg(jax.random.PRNGKey(1))
    a = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)), jnp.float32)
    b = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)), jnp.float32)
    flow = jnp.zeros((2, 32, 32, 2))
    noise = jnp.zeros_like(a)
    flat, unravel = ravel_pytree(params)

    g32, aux32 = loss_and_grads_flat(
        flat, unravel, vgg_params, a, b, flow, noise, SMALL, w, False)
    g16, aux16 = loss_and_grads_flat(
        flat, unravel, vgg_params, a, b, flow, noise, SMALL, w, False,
        compute_dtype=jnp.bfloat16)

    assert g16.dtype == jnp.float32
    assert np.isfinite(np.asarray(g16)).all()
    assert np.isfinite(np.asarray(aux16)).all()
    # same descent direction (bf16 rounding aside)
    a32, a16 = np.asarray(g32).ravel(), np.asarray(g16).ravel()
    cos = float(np.dot(a32, a16)
                / (np.linalg.norm(a32) * np.linalg.norm(a16) + 1e-12))
    assert cos > 0.95, f"bf16/f32 gradient cosine {cos:.4f}"
    np.testing.assert_allclose(np.asarray(aux16), np.asarray(aux32),
                               rtol=0.1, atol=5e-3)


def test_train_loop_data_parallel(tmp_path, rng, monkeypatch):
    """CLI-level data-parallel training: train() over the 8-device mesh
    (global batch = batch_size x devices), reference loss.log line format
    unchanged, checkpoints written."""
    import vstnet_tpu.train.trainer as tr
    from PIL import Image

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    monkeypatch.setattr(tr, "PHOTO_CONFIG", SMALL)

    for name in ("content", "style"):
        d = tmp_path / name
        d.mkdir()
        for i in range(4):
            Image.fromarray(
                (rng.uniform(size=(40, 40, 3)) * 255).astype(np.uint8)
            ).save(d / f"{i}.png")

    from vstnet_tpu.train.losses import LossWeights
    from vstnet_tpu.train.trainer import TrainConfig, train

    tc = TrainConfig(
        batch_size=1, new_size=32, crop_size=32, log_every=1,
        display_size=2, weights=LossWeights(lap=10.0, temporal=0.0),
        logs_directory=str(tmp_path / "logs"), base_name="dp",
    )
    vggp = init_vgg(jax.random.PRNGKey(9))
    state = train(tc, str(tmp_path / "content"), str(tmp_path / "style"),
                  vggp, max_steps=2, loader_workers=1, data_parallel="on")
    assert state.step == 2
    assert np.isfinite(np.asarray(state.flat)).all()

    log = (tmp_path / "logs" / "dp" / "loss.log").read_text()
    assert "Iteration: 00000001/" in log and "style_loss:" in log
    assert (tmp_path / "logs" / "dp" / "checkpoints" / "last.pt").exists()


def test_loader_smaller_dataset_than_batch(tmp_path, rng):
    """Datasets smaller than one batch wrap with replacement instead of
    hanging (the reference's InfiniteSampler wraps too)."""
    from PIL import Image

    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(2):
        Image.fromarray(
            (rng.uniform(size=(20, 20, 3)) * 255).astype(np.uint8)
        ).save(d / f"{i}.png")

    from vstnet_tpu.train.data import InfiniteLoader

    loader = InfiniteLoader(str(d), batch_size=5, new_size=16, crop=16,
                            num_workers=1)
    batch = next(loader)
    loader.close()
    assert batch.shape == (5, 16, 16, 3)


def test_use_lap_flag_parses_false():
    """`--use_lap False` must parse False (the reference's type=bool bug,
    train.py:27, made every spelling truthy)."""
    from vstnet_tpu.cli.train import build_parser

    p = build_parser()
    assert p.parse_args([]).use_lap is True
    assert p.parse_args(["--use_lap", "False"]).use_lap is False
    assert p.parse_args(["--use_lap", "false"]).use_lap is False
    assert p.parse_args(["--use_lap", "0"]).use_lap is False
    assert p.parse_args(["--use_lap", "true"]).use_lap is True
    assert p.parse_args(["--use_lap"]).use_lap is True
