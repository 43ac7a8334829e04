"""Native PJRT engine: export -> compile -> execute -> parity.

The engine prefers the relay TPU plugin (runs on the real chip, compiling
over the relay); it falls back to a locally attached libtpu. Skips cleanly
when no plugin initializes (bare CI machines) — mirroring the reference's
always-runnable C++ engine (ggml_engine.h:533-596) wherever a device
exists.
"""

import os

import numpy as np
import pytest

from vstnet_tpu.runtime.native import ENGINE_LIB, PLUGIN_CANDIDATES


def _engine_platform():
    """Lowering target for the plugin the engine will pick."""
    path = next((p for p in PLUGIN_CANDIDATES if os.path.exists(p)), "")
    name = os.path.basename(path)
    return "tpu" if ("tpu" in name or "axon" in name) else "cpu"


def _make_engine():
    import subprocess
    import sys

    from vstnet_tpu.runtime.native import NativeEngine

    # Plugin init BLOCKS indefinitely (no exception) when the relay
    # backend is down — probe it in a killable subprocess first, the same
    # guard test_native_driver.py uses for its binary.
    try:
        probe = subprocess.run(
            [sys.executable, "-c",
             "from vstnet_tpu.runtime.native import NativeEngine; "
             "NativeEngine().close()"],
            capture_output=True, text=True, timeout=300)
    except subprocess.TimeoutExpired:
        pytest.skip("device backend unreachable (engine init timed out)")
    if probe.returncode != 0:
        pytest.skip(f"no usable PJRT plugin: {probe.stderr[-200:]}")

    try:
        return NativeEngine()
    except (FileNotFoundError, RuntimeError) as e:
        pytest.skip(f"no usable PJRT plugin: {e}")


@pytest.mark.skipif(not os.path.exists(ENGINE_LIB),
                    reason="native engine not built (make engine)")
def test_engine_stylize_parity(rng):
    import jax

    from vstnet_tpu.config import RevResNetConfig
    from vstnet_tpu.models import cwct
    from vstnet_tpu.models.revresnet import decode, encode, init_revresnet
    from vstnet_tpu.runtime.export import export_stylize

    cfg = RevResNetConfig(n_blocks=(1, 1, 1))
    params = init_revresnet(jax.random.PRNGKey(0), cfg)
    mlir, out_shape = export_stylize(
        params, cfg, 32, 32, platforms=(_engine_platform(),))

    eng = _make_engine()
    try:
        eng.compile(mlir)
        c = rng.uniform(size=(1, 32, 32, 3)).astype(np.float32)
        s = rng.uniform(size=(1, 32, 32, 3)).astype(np.float32)
        (out,) = eng.execute([c, s], [out_shape])

        import jax.numpy as jnp

        z_c = encode(params, jnp.asarray(c), cfg)
        z_s = encode(params, jnp.asarray(s), cfg)
        ref = np.asarray(decode(params, cwct.transfer(z_c, z_s), cfg))
        # reference's cross-backend gate: rtol=atol=0.01
        # (project/smoke.py:145); TPU runs convs in bf16-grade precision
        np.testing.assert_allclose(out, ref, rtol=0.01, atol=0.01)
    finally:
        eng.close()
