"""Test configuration: force CPU with 8 virtual devices.

Multi-chip sharding is validated on a virtual CPU mesh (the driver
separately dry-runs the multichip path); unit tests must not depend on TPU
availability.

Note: this image's sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS=axon, so the env var is already snapshotted — we must use
jax.config.update, which works as long as no backend has initialized.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
# The persistent compile cache is DISABLED for the suite: XLA's
# deserialize_executable can SIGABRT a long-lived CPU-backend process on
# a cache-hit read late in a large suite (reproduced 3/3 full-suite runs
# at the same test, while the identical program compiles and cache-reads
# fine in a fresh process or any half-suite chunk). Tests compile every
# program fresh; production processes keep the cache.
os.environ.setdefault("VSTNET_TPU_CACHE", "off")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def patch_interpret_fused(monkeypatch):
    """Route BOTH fused Pallas kernels (coupling + transition) through
    interpret mode — pallas_call cannot lower on the CPU backend. Patches
    the names in ops.coupling_flat and models.revresnet_fast (the fast
    path calls them through its module globals)."""
    import vstnet_tpu.models.revresnet_fast as rf
    import vstnet_tpu.ops.coupling_flat as cflat

    for name in ("fused_coupling_flat", "fused_transition_flat",
                 "fused_transition_full"):
        orig = getattr(cflat, name)

        def patched(*args, __orig=orig, **kw):
            kw["interpret"] = True
            return __orig(*args, **kw)

        monkeypatch.setattr(cflat, name, patched)
        monkeypatch.setattr(rf, name, patched)


@pytest.fixture(autouse=True, scope="module")
def _bound_jax_state():
    """Drop compiled executables and tracing caches between test modules.

    A ~140-test suite accumulates every jitted executable it ever built on
    the 8-virtual-device CPU backend; with that state the LARGEST compile
    in the suite (the in-graph auto-seg video program) segfaults inside
    backend_compile_and_load — while the identical compile succeeds in a
    fresh process or any half-suite chunk (reproduced 3x at the same
    test). Bounding live state per module keeps the big compiles within
    what the CPU backend tolerates; cross-module executable reuse is nil
    by construction (each module builds its own tiny models)."""
    yield
    jax.clear_caches()
