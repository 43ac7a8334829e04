"""Production-depth sharded programs (VERDICT r2 gap #3): the full
30-block (10,10,10) flat train step compiles AND executes on the 8-device
virtual mesh — the multichip dryrun keeps a reduced depth for speed, so
this is the proof that depth-dependent partitioning/collective layout in
the real program is sound.

Budget note: ~5 min of XLA CPU compile on first run (measured 292 s);
the persistent compile cache makes reruns disk hits. This is deliberately
the one slow test in the suite.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.flatten_util import ravel_pytree

from vstnet_tpu.config import PHOTO_CONFIG
from vstnet_tpu.models.revresnet import init_revresnet
from vstnet_tpu.models.vgg import init_vgg
from vstnet_tpu.parallel import make_mesh, make_parallel_flat_step, shard_batch
from vstnet_tpu.train.losses import AUX_KEYS, LossWeights
from vstnet_tpu.train.trainer import TrainConfig, make_optimizer


@pytest.mark.slow
def test_production_depth_parallel_flat_step():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    cfg = PHOTO_CONFIG.with_remat()  # (10,10,10) — the shipped profile
    tc = TrainConfig()
    opt = make_optimizer(tc)
    weights = LossWeights(lap=1500.0, temporal=0.0)
    params = init_revresnet(jax.random.PRNGKey(0), cfg)
    vggp = init_vgg(jax.random.PRNGKey(1))
    flat, unravel = ravel_pytree(params)
    opt_state = opt.init(flat)

    mesh = make_mesh(8, axes=("data",))
    step = make_parallel_flat_step(mesh, opt, cfg, weights, unravel)

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(size=(8, 16, 16, 3)), jnp.float32)
    b = jnp.asarray(rng.uniform(size=(8, 16, 16, 3)), jnp.float32)
    flow = jnp.zeros((8, 16, 16, 2), jnp.float32)
    noise = jnp.zeros_like(a)

    with mesh:
        args = (flat, opt_state, vggp, shard_batch(mesh, a),
                shard_batch(mesh, b), shard_batch(mesh, flow),
                shard_batch(mesh, noise))
        compiled = step.lower(*args).compile()
        f2, o2, aux_stack = compiled(*args)
        jax.block_until_ready(f2)

    aux = dict(zip(AUX_KEYS, aux_stack))
    assert np.isfinite(float(aux["loss_total"]))
    assert np.isfinite(np.asarray(f2)).all()
