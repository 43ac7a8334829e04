"""Isolate the full-train-step slowdown (PERF.md): which ingredient turns
271 ms (fwd+bwd w/o matting) into ~20 s (full step)?

Variants, all jit-compiled, batch 2 @ 256^2, remat on:
  A full step (loss_and_grads, lap=1500)            [known ~20 s]
  B like A but the cotangent is a matting-free function of stylized
    (isolates: nonzero stylized cotangent vs matting itself)
  C like B but matting is also computed for aux only (isolates: matting
    co-residing in the program vs feeding the cotangent)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vstnet_tpu.config import PHOTO_CONFIG
from vstnet_tpu.models.revresnet import init_revresnet
from vstnet_tpu.models.vgg import init_vgg
from vstnet_tpu.ops.matting import matting_loss_and_grad
from vstnet_tpu.train import losses as L
from vstnet_tpu.runtime.timing import timeit_real


def main():
    cfg = PHOTO_CONFIG.with_remat()
    params = init_revresnet(jax.random.PRNGKey(0), cfg)
    vgg_params = init_vgg(jax.random.PRNGKey(1))
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(size=(2, 256, 256, 3)), jnp.float32)
    b = jnp.asarray(rng.uniform(size=(2, 256, 256, 3)), jnp.float32)
    flow = jnp.zeros((2, 256, 256, 2), jnp.float32)
    noise = jnp.zeros_like(a)
    w = L.LossWeights()

    def run(name, fn, *args):
        try:
            dt = timeit_real(fn, *args, iters=3, chain=False)
            print(f"  {name:44s}: {dt * 1000:8.1f} ms", flush=True)
        except Exception as e:
            print(f"  {name:44s}: FAILED {type(e).__name__} "
                  f"{str(e)[:100]}", flush=True)

    def make_step(cotangent_mode):
        @jax.jit
        def step(params, a, b):
            (outs, vjp_fn, aux) = jax.vjp(
                lambda p: L._forward_losses(
                    p, vgg_params, a, b, cfg, w, flow, noise, False),
                params, has_aux=True)
            total, stylized = outs
            if cotangent_mode == "matting":
                _, lap_grad = matting_loss_and_grad(a, stylized)
                ct = jnp.clip(lap_grad * w.lap, -0.05, 0.05)
            elif cotangent_mode == "fake":
                ct = jnp.clip(stylized * w.lap * 1e-4, -0.05, 0.05)
            elif cotangent_mode == "fake+matting_aux":
                lap_ps, _ = matting_loss_and_grad(a, stylized)
                ct = (jnp.clip(stylized * w.lap * 1e-4, -0.05, 0.05)
                      + 0.0 * jnp.mean(lap_ps))
            (grads,) = vjp_fn((jnp.asarray(1.0), ct))
            return jax.tree.map(jnp.sum, (grads,))

        return step

    run("A full step (matting cotangent)", make_step("matting"),
        params, a, b)
    run("B fake cotangent (no matting)", make_step("fake"), params, a, b)
    run("C fake cotangent + matting aux", make_step("fake+matting_aux"),
        params, a, b)


if __name__ == "__main__":
    main()
