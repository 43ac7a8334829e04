"""Trainer: optax Adam + 1/(1+decay·t) LR schedule, grad clip, two-phase
(image -> video fine-tune) training with checkpointing, loss log, and an
HTML sample gallery.

Capability parity with /root/reference/train.py:120-252 (same defaults,
same checkpoint names last.pt / model_image.pt / model_video.pt, same
loss.log line format) on top of the fused step in train/losses.py.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vstnet_tpu.config import ARTISTIC_CONFIG, PHOTO_CONFIG, RevResNetConfig
from vstnet_tpu.models.revresnet import init_revresnet
from vstnet_tpu.train.losses import LossWeights, loss_and_grads


@dataclasses.dataclass
class TrainConfig:
    mode: str = "photorealistic"
    lr: float = 1e-4
    lr_decay: float = 5e-5
    batch_size: int = 2
    new_size: int = 512
    crop_size: int = 256
    training_iterations: int = 160_000
    fine_tuning_iterations: int = 10_000
    grad_clip: float = 5.0
    weights: LossWeights = dataclasses.field(default_factory=LossWeights)
    logs_directory: str = "logs"
    base_name: str = "run"
    log_every: int = 10
    display_size: int = 16
    image_display_iter: int = 1000
    image_save_iter: int = 10_000
    model_save_interval: int = 10_000
    seed: int = 0
    # "f32" = reference semantics (Precision.HIGHEST convs);
    # "bf16" = mixed precision: f32 master weights, bf16 compute
    # (single-pass MXU convs; cWCT/matting keep f32 internals)
    precision: str = "f32"

    @property
    def model_cfg(self) -> RevResNetConfig:
        cfg = (PHOTO_CONFIG if self.mode.lower() == "photorealistic"
               else ARTISTIC_CONFIG)
        return cfg.with_remat()  # block-level remat keeps the 5-pass step in HBM

    @property
    def total_iterations(self) -> int:
        return self.training_iterations + self.fine_tuning_iterations


def make_optimizer(tc: TrainConfig):
    """clip_grad_norm(5) then Adam with lr = lr0 / (1 + decay * t)
    (train.py:200, utils/utils.py:83-86)."""
    schedule = lambda count: tc.lr / (1.0 + tc.lr_decay * count)  # noqa: E731
    return optax.chain(
        optax.clip_by_global_norm(tc.grad_clip),
        optax.adam(learning_rate=schedule),
    )


@dataclasses.dataclass
class TrainState:
    params: dict
    opt_state: object
    step: int = 0


def init_train_state(tc: TrainConfig, params: Optional[dict] = None):
    if params is None:
        params = init_revresnet(jax.random.PRNGKey(tc.seed), tc.model_cfg)
    opt = make_optimizer(tc)
    return TrainState(params=params, opt_state=opt.init(params)), opt


def train_step(state: TrainState, opt, vgg_params, images_a, images_b,
               tc: TrainConfig, flow=None, noise=None,
               temporal_phase: bool = False):
    """One optimizer step; returns (new_state, aux losses dict)."""
    cfg = tc.model_cfg
    if flow is None:
        flow = jnp.zeros((*images_a.shape[:3], 2), jnp.float32)
    if noise is None:
        noise = jnp.zeros_like(images_a)
    grads, aux = loss_and_grads(
        state.params, vgg_params, images_a, images_b, flow, noise,
        cfg, tc.weights, temporal_phase,
    )
    updates, opt_state = opt.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), aux


# ---------------------------------------------------------------------------
# Flat-buffer training: the production step
# ---------------------------------------------------------------------------
#
# The parameter tree is raveled into ONE master vector; gradients are taken
# with respect to it (losses.loss_and_grads_flat) and Adam/clip run
# elementwise on the same vector. Identical math to train_step (tested),
# but a step program has ~6 output buffers instead of ~200 tree leaves —
# per-buffer dispatch overhead (measured ~30-55 ms/buffer through the axon
# PJRT relay: a 5-pass step read 20 s wall against 0.4 s device time) made
# the tree-output step unmeasurable there, and one flat buffer is also the
# natural layout for data-parallel gradient all-reduces.

@dataclasses.dataclass
class FlatTrainState:
    flat: jnp.ndarray          # raveled f32 master parameters
    opt_state: object          # optax state over the flat vector
    unravel: object            # flat -> params pytree (host/trace fn)
    step: int = 0

    @property
    def params(self) -> dict:
        return self.unravel(self.flat)


def init_flat_train_state(tc: TrainConfig, params: Optional[dict] = None):
    from jax.flatten_util import ravel_pytree

    if params is None:
        params = init_revresnet(jax.random.PRNGKey(tc.seed), tc.model_cfg)
    flat, unravel = ravel_pytree(params)
    opt = make_optimizer(tc)
    return FlatTrainState(flat=flat, opt_state=opt.init(flat),
                          unravel=unravel), opt


def make_flat_step(tc: TrainConfig, opt, unravel):
    """Build the jitted flat step: (flat, opt_state, a, b, flow, noise)
    -> (flat', opt_state', aux_stack). Donates flat/opt_state buffers."""
    from vstnet_tpu.train.losses import loss_and_grads_flat

    cfg = tc.model_cfg
    compute_dtype = (jnp.bfloat16 if tc.precision.lower() == "bf16"
                     else None)

    @partial(jax.jit, static_argnames=("temporal_phase",),
             donate_argnums=(0, 1))
    def step(flat, opt_state, vgg_params, a, b, flow, noise,
             temporal_phase=False):
        grads, aux_stack = loss_and_grads_flat(
            flat, unravel, vgg_params, a, b, flow, noise, cfg,
            tc.weights, temporal_phase, compute_dtype=compute_dtype)
        updates, opt_state = opt.update(grads, opt_state, flat)
        return optax.apply_updates(flat, updates), opt_state, aux_stack

    return step


def flat_train_step(state: FlatTrainState, step_fn, vgg_params, images_a,
                    images_b, flow=None, noise=None,
                    temporal_phase: bool = False):
    """Drive one flat step; returns (new_state, aux dict)."""
    from vstnet_tpu.train.losses import AUX_KEYS

    if flow is None:
        flow = jnp.zeros((*images_a.shape[:3], 2), jnp.float32)
    if noise is None:
        noise = jnp.zeros_like(images_a)
    flat, opt_state, aux_stack = step_fn(
        state.flat, state.opt_state, vgg_params, images_a, images_b,
        flow, noise, temporal_phase=temporal_phase)
    aux = dict(zip(AUX_KEYS, aux_stack))
    return FlatTrainState(flat, opt_state, state.unravel,
                          state.step + 1), aux


# ---------------------------------------------------------------------------
# Checkpointing (reference-compatible names and formats)
# ---------------------------------------------------------------------------

def save_checkpoint(state: TrainState, ckpt_dir: str, name: str = "last.pt",
                    with_optimizer: bool = True):
    from vstnet_tpu.io.checkpoint import save_native, save_torch_checkpoint

    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, name)
    save_torch_checkpoint(state.params, path)
    if with_optimizer:
        save_native(
            {"opt_state": _opt_state_to_tree(state.opt_state),
             "step": np.asarray(state.step)},
            path + ".opt.msgpack",
        )
    return path


def load_checkpoint(tc: TrainConfig, ckpt_dir: str, name: str = "last.pt",
                    resume_iter: int = -1, flat: bool = False):
    from vstnet_tpu.io.checkpoint import load_native, load_revresnet

    path = os.path.join(ckpt_dir, name)
    params = load_revresnet(path)
    if flat:
        state, opt = init_flat_train_state(tc, params)
    else:
        state, opt = init_train_state(tc, params)
    opt_path = path + ".opt.msgpack"
    if os.path.exists(opt_path):
        blob = load_native(opt_path)
        state.opt_state = _opt_state_from_tree(blob["opt_state"], state.opt_state)
        state.step = int(blob["step"]) if resume_iter < 0 else resume_iter
    elif resume_iter >= 0:
        state.step = resume_iter
    return state, opt


def _opt_state_to_tree(opt_state):
    leaves = jax.tree_util.tree_leaves(opt_state)
    return {"leaves": [np.asarray(l) for l in leaves]}


def _opt_state_from_tree(tree, template):
    leaves = tree["leaves"]
    treedef = jax.tree_util.tree_structure(template)
    t_leaves = jax.tree_util.tree_leaves(template)
    new = [
        jnp.asarray(l).astype(t.dtype) if hasattr(t, "dtype") else l
        for l, t in zip(leaves, t_leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, new)


# ---------------------------------------------------------------------------
# Logging helpers (loss.log + image grid + auto-refresh HTML)
# ---------------------------------------------------------------------------

def write_loss_log(logs_dir: str, message: str):
    os.makedirs(logs_dir, exist_ok=True)
    with open(os.path.join(logs_dir, "loss.log"), "a") as f:
        f.write(message + "\n")


def write_sample_grid(path: str, rows):
    """rows: list of (B, H, W, 3) arrays -> one image, rows stacked
    vertically, batch horizontally (like write_2images/make_grid)."""
    from PIL import Image

    grid = np.concatenate(
        [np.concatenate(list(np.clip(np.asarray(r), 0, 1)), axis=1)
         for r in rows],
        axis=0,
    )
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    Image.fromarray((grid * 255).astype(np.uint8)).save(path)
    return path


def write_html(logs_dir: str, iterations: int, image_save_iter: int):
    rows = ['<h3>current</h3>',
            '<img src="images/train_current.jpg" style="width:1024px"><br>']
    for j in range(iterations, image_save_iter - 1, -image_save_iter):
        if j % image_save_iter == 0:
            rows.append(f"<h3>iteration {j}</h3>")
            rows.append(
                f'<img src="images/train_{j:08d}.jpg" style="width:1024px"><br>')
    html = ("<!DOCTYPE html><html><head><title>vstnet_tpu training</title>"
            '<meta http-equiv="refresh" content="60"></head><body>'
            + "\n".join(rows) + "</body></html>")
    with open(os.path.join(logs_dir, "index.html"), "w") as f:
        f.write(html)


# ---------------------------------------------------------------------------
# Full training loop
# ---------------------------------------------------------------------------

def train(tc: TrainConfig, content_dir, style_dir, vgg_params,
          resume: bool = False, resume_iter: int = -1,
          max_steps: Optional[int] = None, loader_workers: int = 4,
          data_parallel: str = "auto"):
    """The reference train.py loop. `max_steps` caps the run (for tests).

    data_parallel: "auto" uses every local device when more than one is
    visible (mesh over 'data', loader batch scaled by the device count,
    the flat gradient all-reduced as ONE fused collective); "on" requires
    >1 device; "off" forces single-device. loss.log format is unchanged
    (losses are global-batch means either way).
    """
    from vstnet_tpu.ops.warp import generate_fake_flow
    from vstnet_tpu.parallel.multihost import (
        host_local_to_global,
        init_distributed,
        process_batch_bounds,
    )
    from vstnet_tpu.train.data import InfiniteLoader

    # pod scaffolding: env-gated (VSTNET_COORDINATOR/...); single-host
    # runs fall straight through with process_count() == 1
    init_distributed()
    n_proc = jax.process_count()
    n_dev = jax.device_count()  # GLOBAL device count (spans hosts)
    if data_parallel == "on" and n_dev < 2:
        raise ValueError(f"--data_parallel on: only {n_dev} device visible")
    use_dp = data_parallel in ("auto", "on") and n_dev > 1
    batch = tc.batch_size * (n_dev if use_dp else 1)
    # each host's loaders produce only its contiguous slice of the batch
    lo, hi = process_batch_bounds(batch, n_proc)
    local_batch = hi - lo

    logs_dir = os.path.join(tc.logs_directory, tc.base_name)
    ckpt_dir = os.path.join(logs_dir, "checkpoints")
    img_dir = os.path.join(logs_dir, "images")
    os.makedirs(img_dir, exist_ok=True)

    loader_a = InfiniteLoader(content_dir, local_batch, tc.new_size,
                              tc.crop_size, num_workers=loader_workers,
                              seed=tc.seed + jax.process_index())
    loader_b = InfiniteLoader(style_dir, local_batch, tc.new_size,
                              tc.crop_size, num_workers=loader_workers,
                              seed=tc.seed + 1000 + jax.process_index())

    if resume:
        state, opt = load_checkpoint(tc, ckpt_dir, resume_iter=resume_iter,
                                     flat=True)
        print(f"Resume from {ckpt_dir}/last.pt at iter {state.step}")
    else:
        state, opt = init_flat_train_state(tc)

    mesh = None
    if use_dp:
        from vstnet_tpu.parallel import make_mesh, make_parallel_flat_step
        from vstnet_tpu.parallel import shard_batch as _shard

        mesh = make_mesh(n_dev, axes=("data",))
        if jax.process_index() == 0:
            print(f"data-parallel training over {n_dev} devices"
                  + (f" on {n_proc} hosts" if n_proc > 1 else "")
                  + f" (global batch {batch})")
        pstep = make_parallel_flat_step(
            mesh, opt, tc.model_cfg, tc.weights, state.unravel,
            compute_dtype=(jnp.bfloat16 if tc.precision.lower() == "bf16"
                           else None))

        if n_proc > 1:
            # per-host local rows -> one global batch-sharded array
            def _shard(mesh, x):  # noqa: F811
                return host_local_to_global(mesh, np.asarray(x))

        def step_fn(flat, opt_state, vggp, a, b, flow, noise,
                    temporal_phase=False):
            with mesh:
                return pstep(flat, opt_state, vggp,
                             _shard(mesh, a), _shard(mesh, b),
                             _shard(mesh, flow), _shard(mesh, noise),
                             temporal_phase)
    else:
        step_fn = make_flat_step(tc, opt, state.unravel)

    host_rng = np.random.default_rng(tc.seed + 7 + jax.process_index())
    noise_key = jax.random.PRNGKey(tc.seed + 13 + jax.process_index())
    t0 = time.time()
    end = tc.total_iterations if max_steps is None else min(
        tc.total_iterations, state.step + max_steps)

    while state.step < end:
        a = jnp.asarray(next(loader_a))
        b = jnp.asarray(next(loader_b))

        temporal = (tc.weights.temporal > 0
                    and state.step > tc.training_iterations)
        flow = noise = None
        if temporal:
            f = generate_fake_flow(host_rng, a.shape[1], a.shape[2])
            flow = jnp.broadcast_to(
                jnp.asarray(f)[None], (*a.shape[:3], 2))
            noise_key, sub = jax.random.split(noise_key)
            stddev = tc.weights.noise_level * (1 + host_rng.random())
            noise = stddev * jax.random.normal(sub, a.shape)

        state, aux = flat_train_step(state, step_fn, vgg_params, a, b,
                                     flow, noise, temporal)

        it = state.step
        if n_proc > 1 and jax.process_index() != 0:
            continue  # logging/samples/checkpoints are process-0 duties
        if it % tc.log_every == 0:
            w = tc.weights
            msg = (
                "Iteration: %08d/%08d  content_loss:%.4f  lap_loss:%.4f  "
                "rec_loss:%.4f  style_loss:%.4f  loss_tmp:%.4f  "
                "loss_tmp_GT:%.4f  (%.2f s/it)" % (
                    it, tc.total_iterations,
                    w.content * float(aux["loss_c"]),
                    w.lap * float(aux["loss_lap"]),
                    w.rec * float(aux["loss_rec"]),
                    w.style * float(aux["loss_s"]),
                    w.temporal * float(aux["loss_tmp"]),
                    w.temporal * float(aux["loss_tmp_gt"]),
                    (time.time() - t0) / max(it, 1),
                ))
            print(msg)
            write_loss_log(logs_dir, msg)

        if it % tc.image_display_iter == 0 or it == end:
            da, db = _display_batches(loader_a, loader_b, tc, a, b)
            _write_samples(state, tc, da, db, img_dir, "train_current.jpg")
        if it % tc.image_save_iter == 0:
            da, db = _display_batches(loader_a, loader_b, tc, a, b)
            _write_samples(state, tc, da, db, img_dir, f"train_{it:08d}.jpg")
            write_html(logs_dir, it, tc.image_save_iter)
        if it % tc.model_save_interval == 0:
            save_checkpoint(state, ckpt_dir, "last.pt")
        if it == tc.training_iterations:
            save_checkpoint(state, ckpt_dir, "model_image.pt",
                            with_optimizer=False)
        elif it == tc.total_iterations:
            save_checkpoint(state, ckpt_dir, "model_video.pt",
                            with_optimizer=False)

    loader_a.close()
    loader_b.close()
    if jax.process_index() == 0:
        save_checkpoint(state, ckpt_dir, "last.pt")
    return state


from functools import partial


@partial(jax.jit, static_argnames=("cfg",))
def _sample_outputs(params, a, b, cfg):
    from vstnet_tpu.models import cwct as _cwct
    from vstnet_tpu.models.revresnet import decode as _dec
    from vstnet_tpu.models.revresnet import encode as _enc

    z_c = _enc(params, a, cfg)
    z_s = _enc(params, b, cfg)
    stylized = _dec(params, _cwct.transfer(z_c, z_s), cfg)
    z2 = _enc(params, stylized, cfg)
    rec = _dec(params, _cwct.transfer(z2, z_c), cfg)
    return stylized, rec


def _display_batches(loader_a, loader_b, tc, a, b):
    """display_size random dataset images for the sample grids
    (train.py:222-224); falls back to the current batch when the loaders
    can't sample (e.g. synthetic-batch tests driving train_step directly)."""
    try:
        if not (hasattr(loader_a, "sample") and hasattr(loader_b, "sample")):
            return a, b  # loader has no sample() (synthetic batches)
        da = jnp.asarray(loader_a.sample(tc.display_size))
        db = jnp.asarray(loader_b.sample(tc.display_size))
        return da, db
    except Exception as e:  # operational failure: fall back, but say so
        print(f"warning: display sampling failed ({e!r}); "
              "using the current batch for sample grids")
        return a, b


def _write_samples(state, tc, a, b, img_dir, name):
    """[content | style | stylized | cycle-reconstruction] grid, like
    RevResNet.sample (models/RevResNet.py:241-263)."""
    stylized, rec = _sample_outputs(state.params, a, b, tc.model_cfg)
    write_sample_grid(os.path.join(img_dir, name), [a, b, stylized, rec])
