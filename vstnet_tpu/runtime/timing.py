"""Honest device timing.

On this image's axon-relay TPU, `block_until_ready()` acks before real
execution completes (measured: a chained 8192^3 matmul loop "finishes" at
37 PFLOP/s). The only trustworthy fence is a host readback of (a slice of)
the result. All benchmarks in this repo must use `timeit_real`.
"""

from __future__ import annotations

import time
from typing import Callable

import numpy as np


def force(x):
    """Force real execution by reading a small slice back to the host."""
    import jax

    leaves = jax.tree_util.tree_leaves(x)
    out = []
    for leaf in leaves:
        flat = leaf.reshape(-1)
        out.append(np.asarray(flat[:1]))
    return out


def timeit_real(fn: Callable, *args, iters: int = 10, warmup: int = 2,
                chain: bool = True):
    """Time fn(*args) with a host readback fence.

    If chain=True and fn's output is shape-compatible with its first arg,
    feeds the output back as the first argument so iterations can't be
    elided or overlapped dishonestly.
    """
    out = fn(*args)
    for _ in range(warmup):
        out = fn(*args)
    force(out)

    t0 = time.perf_counter()
    if chain:
        first = args[0]
        rest = args[1:]
        x = first
        ok = False
        try:
            import jax

            ok = (
                hasattr(out, "shape") and hasattr(first, "shape")
                and out.shape == first.shape and out.dtype == first.dtype
            )
        except Exception:
            ok = False
        if ok:
            for _ in range(iters):
                x = fn(x, *rest)
            force(x)
            return (time.perf_counter() - t0) / iters
    for _ in range(iters):
        out = fn(*args)
        force(out)
    return (time.perf_counter() - t0) / iters
