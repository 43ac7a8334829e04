"""Stage-3 conv-form experiment: XLA conv_general_dilated vs 9-tap dot
(conv2d_nchw_dot) for the 256ch stride-1 coupling branches.

Motivation (PERF.md round-3 roofline): ~24% of the fused stylize frame is
layout glue, part of it XLA's conv-layout transposes around stage3
(e.g. a [64,512,128,128] %copy at 77 us). The dot form pins the NCHW
contraction layout — no operand transposes — at the cost of 9 partial-sum
fusions. This script measures both forms in a realistic context: a chain
of 10 coupling blocks at stage3 shape (B, 256, 128, 128) bf16.

Device-plane methodology (xplane trace) — relay-RPC-proof.

Usage: python scripts/bench_stage3_form.py [batch]
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from vstnet_tpu.ops.pad_conv import conv2d_nchw_dot


def branch_params(key, c, mid):
    k1, k2, k3 = jax.random.split(key, 3)
    he = lambda k, kh, kw, ci, co: (
        jax.random.normal(k, (kh, kw, ci, co), jnp.float32)
        * np.sqrt(2.0 / (kh * kw * ci)))
    return {
        "conv1": {"w": he(k1, 3, 3, c, mid), "b": jnp.zeros((mid,))},
        "conv2": {"w": he(k2, 3, 3, mid, mid), "b": jnp.zeros((mid,))},
        "conv3": {"w": he(k3, 3, 3, mid, c), "b": jnp.zeros((c,))},
    }


def _reflect(x, p=1):
    return jnp.pad(x, ((0, 0), (0, 0), (p, p), (p, p)), mode="reflect")


def conv_xla(x, w, b, relu):
    out = lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), "VALID",
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
        preferred_element_type=jnp.float32)
    out = out + b.astype(jnp.float32)[None, :, None, None]
    if relu:
        out = jax.nn.relu(out)
    return out.astype(x.dtype)


def conv_xla_bf16out(x, w, b, relu):
    # conv emits bf16 directly (f32 MXU accumulation, converted at the
    # output write) -> the bias+relu epilogue fusion moves half the bytes
    out = lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), "VALID",
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
        preferred_element_type=x.dtype)
    out = out + b.astype(x.dtype)[None, :, None, None]
    if relu:
        out = jax.nn.relu(out)
    return out


def conv_nhwc(x, w, b, relu):
    # NHWC operand/result layout (C minor = XLA TPU's preferred conv
    # layout) — measures what the NCHW form pays in layout copies
    out = lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    out = out + b.astype(jnp.float32)
    if relu:
        out = jax.nn.relu(out)
    return out.astype(x.dtype)


def conv_dot(x, w, b, relu):
    out = conv2d_nchw_dot(x, w, b)
    if relu:
        out = jax.nn.relu(out.astype(jnp.float32)).astype(x.dtype)
    return out


def _reflect_nhwc(x, p=1):
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


FORMS = {
    "xla": (conv_xla, _reflect),
    "dot": (conv_dot, _reflect),
    "bf16out": (conv_xla_bf16out, _reflect),
    "nhwc": (conv_nhwc, _reflect_nhwc),
}


def branch(x, bp, form):
    f, refl = FORMS[form]
    h = f(refl(x), bp["conv1"]["w"], bp["conv1"]["b"], True)
    h = f(refl(h), bp["conv2"]["w"], bp["conv2"]["b"], True)
    return f(refl(h), bp["conv3"]["w"], bp["conv3"]["b"], False)


def device_us(logdir):
    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    total = 0
    for p in paths:
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "Device" not in plane.name:
                continue
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    total += ev.duration_ps
    return total / 1e6


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    c, mid, hw, depth = 256, 64, 128, 10
    bps = [branch_params(jax.random.PRNGKey(i), c, mid)
           for i in range(depth)]
    bps = jax.tree.map(lambda a: a.astype(jnp.bfloat16), bps)
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.standard_normal((batch, c, hw, hw)), jnp.bfloat16)
    x2 = jnp.asarray(rng.standard_normal((batch, c, hw, hw)), jnp.bfloat16)

    forms = sys.argv[2].split(",") if len(sys.argv) > 2 else ("xla", "dot")
    for form in forms:
        xa, xb = x1, x2
        if form == "nhwc":
            xa = jnp.transpose(xa, (0, 2, 3, 1))
            xb = jnp.transpose(xb, (0, 2, 3, 1))

        @jax.jit
        def chain(x1, x2):
            for bp in bps:
                x1, x2 = x2, (branch(x2, bp, form) + x1)
            return x1, x2

        a, b = chain(xa, xb)
        _ = np.asarray(a[0, 0, :2, 0])
        n = 3
        logdir = f"/tmp/prof_stage3_{form}"
        os.system(f"rm -rf {logdir}")
        with jax.profiler.trace(logdir):
            for _ in range(n):
                a, b = chain(a, b)
            _ = np.asarray(a[0, 0, :2, 0])
        us = device_us(logdir) / n / batch
        print(f"{form}: {us:8.1f} us/frame for {depth} blocks "
              f"({us/depth:6.1f} us/block) @B{batch} {c}ch {hw}^2")


if __name__ == "__main__":
    main()
