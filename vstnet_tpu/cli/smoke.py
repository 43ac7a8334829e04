"""Smoke/bench/parity harness — the vstnet_tpu equivalent of
/root/reference/project/smoke.py:

  * shape sweep:     N random resolutions ±jitter around a base size
                     through the bucketed stylizer (smoke.py:20-54's
                     dynamic-shape robustness test, bounded-compile form)
  * profiler bench:  per-stage timings with honest readback fencing
                     (smoke.py:57-78's torch.profiler table)
  * parity gate:     cross-backend output equivalence vs the reference
                     PyTorch implementation with shared random weights,
                     rtol=atol=0.01 (smoke.py's torch-vs-ONNX gate at :145)
                     plus PSNR reporting

Usage:
    python -m vstnet_tpu.cli.smoke [--test shapes|bench|parity|all]
        [--size 512] [--iters 20] [--batch 8]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def test_input_shapes(size: int, n: int = 20, jitter: int = 16, seed: int = 0):
    import jax.numpy as jnp

    from vstnet_tpu.models.pipeline import StyleModel
    from vstnet_tpu.runtime.buckets import BucketedStylizer

    model = StyleModel.random_init()
    stylizer = BucketedStylizer(model)
    rng = np.random.default_rng(seed)

    times = []
    for i in range(n):
        h = size + int(rng.integers(-jitter, jitter + 1))
        w = size + int(rng.integers(-jitter, jitter + 1))
        h, w = h // 4 * 4, w // 4 * 4
        c = jnp.asarray(rng.uniform(size=(1, h, w, 3)), jnp.float32)
        s = jnp.asarray(rng.uniform(size=(1, h, w, 3)), jnp.float32)
        t0 = time.perf_counter()
        out = stylizer(c, s)
        val = np.asarray(out[0, 0, :2, 0])  # readback fence
        dt = time.perf_counter() - t0
        assert out.shape == (1, h, w, 3), (out.shape, (h, w))
        assert np.isfinite(val).all()
        times.append(dt)
        print(f"  [{i + 1}/{n}] {h}x{w}: {dt * 1000:.1f} ms")
    print(f"shape sweep OK: mean {np.mean(times) * 1000:.1f} ms, "
          f"median {np.median(times) * 1000:.1f} ms "
          f"(first-hit compiles included)")


def run_benchmark(size: int, batch: int, iters: int):
    import jax
    import jax.numpy as jnp

    from vstnet_tpu.config import PHOTO_CONFIG
    from vstnet_tpu.models import cwct
    from vstnet_tpu.models.revresnet import decode, encode, init_revresnet
    from vstnet_tpu.runtime.timing import force

    cfg = PHOTO_CONFIG
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16),
        init_revresnet(jax.random.PRNGKey(0), cfg),
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(batch, size, size, 3)), jnp.bfloat16)

    stages = {
        "encode": jax.jit(lambda p, x: encode(p, x, cfg)),
        "decode": None,  # filled below (needs a latent)
        "cwct": None,
    }
    z = stages["encode"](params, x)
    ls, mu = cwct.style_factors(z[:1])
    stages["decode"] = jax.jit(lambda p, z: decode(p, z, cfg))
    stages["cwct"] = jax.jit(lambda z: cwct.transfer_with_factors(z, ls, mu))

    print(f"per-stage timings ({batch}x{size}x{size}, bf16, {iters} iters):")
    for name, fn in stages.items():
        args = (params, x) if name == "encode" else (
            (params, z) if name == "decode" else (z,))
        out = fn(*args)
        force(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        force(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"  {name:8s}: {dt * 1000:7.2f} ms "
              f"({dt / batch * 1000:.2f} ms/frame)")


def photo_pipeline_bench(size: int = 1024, iters: int = 5):
    """Apples-to-apples vs the reference's full photo pipeline: pad ->
    encode c/s -> TWO SegFormer-B4 passes -> masked cWCT -> decode -> Lab
    blend at 1024x1024 (reference: ~800 ms on GPU, vstnet.py:170;
    SegFormer alone ~120 ms, segment.py:479)."""
    import jax
    import jax.numpy as jnp

    from vstnet_tpu.models.pipeline import StyleModel, photo_forward
    from vstnet_tpu.models.segformer import Segmenter, segment_mask
    from vstnet_tpu.runtime.timing import timeit_real

    model = StyleModel.random_init(mode="photorealistic")
    seg = Segmenter.load(None)
    rng = np.random.default_rng(0)
    c = jnp.asarray(rng.uniform(size=(1, size, size, 3)), jnp.float32)
    s = jnp.asarray(rng.uniform(size=(1, size, size, 3)), jnp.float32)

    seg_fn = jax.jit(lambda x: segment_mask(seg.params, x))
    dt_seg = timeit_real(seg_fn, c, iters=iters, chain=False)
    print(f"  segformer-b4 @{size}²          : {dt_seg * 1000:7.1f} ms "
          "(reference ~120 ms)")
    seg_fn16 = jax.jit(lambda x: segment_mask(seg.params, x, half=True))
    dt_seg16 = timeit_real(seg_fn16, c, iters=iters, chain=False)
    print(f"  segformer-b4 @{size}² bf16     : {dt_seg16 * 1000:7.1f} ms")

    from vstnet_tpu.models.pipeline import photo_forward_fast

    @jax.jit
    def full(params, c, s):
        # one batched segmenter pass for both images; the fidelity path
        # keeps the f32 segmenter
        cm, sm = jnp.split(
            segment_mask(seg.params, jnp.concatenate([c, s])), 2)
        return photo_forward(params, c, s, cm, sm, model.cfg,
                             max_labels=64, use_masks=True)

    @jax.jit
    def full_fast(fast, c, s):
        # bf16 segmenter on the fast path (reference deploys half,
        # segment.py:479; 74.8 -> 55.3 ms @1024² — PERF.md)
        cm, sm = jnp.split(
            segment_mask(seg.params, jnp.concatenate([c, s]), half=True), 2)
        return photo_forward_fast(fast, c, s, cm, sm, model.cfg,
                                  max_labels=64, use_masks=True)

    dt = timeit_real(full, model.params, c, s, iters=iters, chain=False)
    print(f"  full photo pipeline @{size}² f32: {dt * 1000:7.1f} ms "
          f"(reference ~800 ms => {800 / (dt * 1000):.1f}x)")
    dt_fast = timeit_real(full_fast, model.fast_params, c, s, iters=iters,
                          chain=False)
    print(f"  full photo pipeline @{size}² fast: {dt_fast * 1000:6.1f} ms "
          f"(reference ~800 ms => {800 / (dt_fast * 1000):.1f}x)")
    return dt_seg, dt, dt_fast


def train_profile(size: int = 256, batch: int = 2, iters: int = 5):
    """Per-stage profile of the training step (the reference trains at
    crop 256 / batch 2, train.py:23-25). Answers where the step time goes:
    the 5-pass reversible structure, VGG losses, matting gradient, remat."""
    import jax
    import jax.numpy as jnp

    from vstnet_tpu.config import PHOTO_CONFIG
    from vstnet_tpu.models.revresnet import decode, encode, init_revresnet
    from vstnet_tpu.models.vgg import init_vgg, vgg_losses
    from vstnet_tpu.ops.matting import matting_loss_and_grad
    from vstnet_tpu.runtime.timing import timeit_real

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(size=(batch, size, size, 3)), jnp.float32)
    b = jnp.asarray(rng.uniform(size=(batch, size, size, 3)), jnp.float32)
    flow = jnp.zeros((batch, size, size, 2), jnp.float32)
    noise = jnp.zeros_like(a)
    vgg_params = init_vgg(jax.random.PRNGKey(1))

    rows = []

    def add(name, fn, *args, **kw):
        try:
            dt = timeit_real(fn, *args, iters=iters, chain=False, **kw)
        except Exception as e:  # OOM/compile failure: report, keep going
            print(f"  {name:34s}:   FAILED "
                  f"({type(e).__name__}: {str(e)[:120]})")
            return
        rows.append((name, dt))
        print(f"  {name:34s}: {dt * 1000:8.1f} ms")

    # components first (remat-independent; informative even if the full
    # step OOMs/fails)
    cfg = PHOTO_CONFIG
    params = init_revresnet(jax.random.PRNGKey(0), cfg)
    print(f"train components ({batch}x{size}x{size}, f32):")
    add("encode (1 of 5 passes, fwd only)", jax.jit(
        lambda p, x: encode(p, x, cfg)), params, a)
    z = jax.jit(lambda p, x: encode(p, x, cfg))(params, a)
    add("decode (fwd only)", jax.jit(
        lambda p, z: decode(p, z, cfg)), params, z)
    # grads reduced to ONE scalar output: a tree-output program reads
    # ~30-55 ms/buffer of relay dispatch overhead (~100 leaves -> ~5 s
    # wall for a 66 ms program) — see PERF.md
    add("encode fwd+bwd (grad-norm fenced)", jax.jit(
        lambda p, x: sum(
            jnp.vdot(l, l) for l in jax.tree.leaves(jax.grad(
                lambda pp: jnp.sum(jnp.square(encode(pp, x, cfg))))(p)))),
        params, a)
    add("vgg losses (fwd only)", jax.jit(
        lambda a, b: vgg_losses(vgg_params, a, b, b, n_layer=4)), a, b)
    add("matting loss+grad (fwd only)", jax.jit(
        lambda a, b: matting_loss_and_grad(a, b)), a, b)

    # the production step: flat master buffer, ~6 output buffers. (The
    # tree-output step is unmeasurable through the axon relay: ~30-55 ms
    # PER OUTPUT BUFFER of dispatch overhead made ~200 grad/param leaves
    # read as ~20 s wall against ~0.4 s device time — PERF.md.)
    from vstnet_tpu.train.trainer import (
        TrainConfig as _TC,
        init_flat_train_state,
        make_flat_step,
    )

    tc = _TC()
    state, opt_f = init_flat_train_state(tc)
    step_fn = make_flat_step(tc, opt_f, state.unravel)
    print(f"train step ({batch}x{size}x{size}, f32, remat=on, "
          "flat master buffer):")
    import time as _time

    # chained manually: the step donates flat/opt_state, so each call
    # must consume the previous call's outputs
    flat, opt_state = state.flat, state.opt_state
    flat, opt_state, aux = step_fn(flat, opt_state, vgg_params, a, b,
                                   flow, noise)
    _ = np.asarray(aux)  # compile + warm + fence
    t0 = _time.perf_counter()
    for _ in range(iters):
        flat, opt_state, aux = step_fn(flat, opt_state, vgg_params, a, b,
                                       flow, noise)
    _ = np.asarray(aux)
    dt = (_time.perf_counter() - t0) / iters
    rows.append(("full step (5-pass + losses + adam)", dt))
    print(f"  full step (5-pass + losses + adam)  : {dt * 1000:8.1f} ms")
    print(f"  => {1.0 / dt:.2f} steps/sec "
          f"(reference-scale run: 170k iters in "
          f"{170e3 * dt / 3600:.1f} h)")
    return rows


def parity_gate(size: int = 128, seed: int = 0):
    """Cross-backend numeric parity vs the reference torch model."""
    import sys
    import types

    import jax
    import jax.numpy as jnp
    import torch

    from vstnet_tpu.config import PHOTO_CONFIG
    from vstnet_tpu.io.checkpoint import revresnet_to_torch
    from vstnet_tpu.models import cwct
    from vstnet_tpu.models.revresnet import decode, encode, init_revresnet

    sys.modules.setdefault(
        "todos",
        types.SimpleNamespace(debug=types.SimpleNamespace(
            output_var=lambda *a, **k: None)),
    )
    sys.path.insert(0, "/root/reference")
    from models.RevResNet import RevResNet  # type: ignore

    sys.path.remove("/root/reference")

    cfg = PHOTO_CONFIG
    params = init_revresnet(jax.random.PRNGKey(seed), cfg)
    tmodel = RevResNet(hidden_dim=cfg.hidden_dim, sp_steps=cfg.sp_steps)
    tmodel.load_state_dict({
        k: torch.from_numpy(np.array(v, copy=True))
        for k, v in revresnet_to_torch(params).items()
    })
    tmodel.eval()

    rng = np.random.default_rng(seed)
    c = rng.uniform(size=(1, size, size, 3)).astype(np.float32)
    s = rng.uniform(size=(1, size, size, 3)).astype(np.float32)

    # full stylize on both backends
    z_c = encode(params, jnp.asarray(c), cfg)
    z_s = encode(params, jnp.asarray(s), cfg)
    out_jax = np.asarray(decode(params, cwct.transfer(z_c, z_s), cfg))

    with torch.no_grad():
        tzc = tmodel(torch.from_numpy(c.transpose(0, 3, 1, 2)))
        tzs = tmodel(torch.from_numpy(s.transpose(0, 3, 1, 2)))
        # reference batched whitening is broken (cWCT.py:144, see
        # tests/test_cwct.py); use its per-sample 2D path
        sys.path.insert(0, "/root/reference")
        from models.cWCT import cWCT  # type: ignore

        sys.path.remove("/root/reference")
        cw = cWCT()
        n = tzc.shape[1]
        w = cw.whitening(tzc[0].reshape(n, -1))
        col = cw.coloring(w, tzs[0].reshape(n, -1))
        tz = col.reshape(tzc.shape)
        out_t = tmodel(tz, forward=False).numpy().transpose(0, 2, 3, 1)

    abs_err = np.abs(out_jax - out_t)
    mse = float((abs_err ** 2).mean())
    psnr = 10 * np.log10(1.0 / mse) if mse > 0 else float("inf")
    ok = np.allclose(out_jax, out_t, rtol=0.01, atol=0.01)
    print(f"parity gate: max err {abs_err.max():.2e}, PSNR {psnr:.1f} dB, "
          f"rtol/atol 0.01 -> {'PASS' if ok else 'FAIL'}")
    if not ok:
        raise SystemExit(1)
    assert psnr >= 40.0, f"PSNR {psnr:.1f} below the 40 dB gate"


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--test", default="all",
                   choices=["shapes", "bench", "parity", "train", "photo", "all"])
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--n_shapes", type=int, default=10)
    p.add_argument("--profile", metavar="LOGDIR", default=None,
                   help="capture a jax.profiler trace of the run under "
                        "LOGDIR (TensorBoard/xprof format) and print "
                        "device memory stats at exit")
    args = p.parse_args(argv)

    import contextlib

    profile_ctx = contextlib.nullcontext()
    if args.profile:
        from vstnet_tpu.runtime.profiling import trace

        profile_ctx = trace(args.profile)

    with profile_ctx:
        _run_tests(args)

    if args.profile:
        from vstnet_tpu.runtime.profiling import format_memory_report

        print(f"profile trace written to {args.profile}")
        print("device memory:")
        print(format_memory_report())


def _run_tests(args):
    if args.test in ("parity", "all"):
        parity_gate(min(args.size, 128))
    if args.test in ("shapes", "all"):
        test_input_shapes(args.size, n=args.n_shapes)
    if args.test in ("bench", "all"):
        run_benchmark(args.size, args.batch, args.iters)
    if args.test == "train":
        train_profile(min(args.size, 256), batch=2, iters=args.iters)
    if args.test == "photo":
        photo_pipeline_bench(args.size, iters=args.iters)


if __name__ == "__main__":
    main()
