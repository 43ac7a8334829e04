"""Invertible 1x1 convolution ("invertible MLP" over channels).

Capability parity with the reference's InvConv2d
(/root/reference/models/RevResNet.py:46-65): an orthogonally-initialized
1x1 conv with bias whose inverse applies the matrix inverse. The reference
defines it but never wires it into a shipped config; it is provided here
for completeness of the reversible-op vocabulary.

TPU-native form: a channels-last einsum (one MXU dot over the channel
axis) instead of a 1x1 conv — identical math, no layout shuffle. The
inverse solves against the weight via LU on the host-sized (C, C) matrix,
which XLA fuses into the same program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_invconv(key, channel: int):
    """Orthogonal weight (QR of a random normal) + random-normal bias,
    matching the reference init (RevResNet.py:51-56)."""
    kw, kb = jax.random.split(key)
    w = jax.random.normal(kw, (channel, channel), jnp.float32)
    q, _ = jnp.linalg.qr(w)
    b = jax.random.normal(kb, (channel,), jnp.float32)
    return {"w": q, "b": b}


def invconv_forward(params, x):
    """x: NHWC (B, H, W, C) -> W x + b over the channel axis.

    Matches F.conv2d(x, weight) + bias (RevResNet.py:58-61): torch's
    (Cout, Cin, 1, 1) kernel contracts the input channel with W's second
    index."""
    y = jnp.einsum("bhwc,oc->bhwo", x, params["w"],
                   precision=jax.lax.Precision.HIGHEST)
    return y + params["b"]


def invconv_inverse(params, y):
    """Exact algebraic inverse: W^-1 (y - b) (RevResNet.py:63-65)."""
    x = y - params["b"]
    w_inv = jnp.linalg.inv(params["w"])
    return jnp.einsum("bhwc,oc->bhwo", x, w_inv,
                      precision=jax.lax.Precision.HIGHEST)
