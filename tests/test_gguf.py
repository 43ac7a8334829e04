"""GGUF codec: native<->python cross-parity, f16/f32, checkpoint round trip."""

import os

import numpy as np
import pytest

import vstnet_tpu.io.gguf as gg


@pytest.fixture
def tensors(rng):
    return {
        "stack.0.conv.1.weight": rng.standard_normal((4, 16, 3, 3)).astype(np.float32),
        "stack.0.conv.1.bias": rng.standard_normal((4,)).astype(np.float32),
        "channel_reduction.block_list.0.conv.7.weight":
            rng.standard_normal((256, 64, 3, 3)).astype(np.float32),
    }


@pytest.mark.parametrize("dtype,atol", [("f32", 0.0), ("f16", 2e-3)])
def test_roundtrip_python(tmp_path, tensors, dtype, atol, monkeypatch):
    monkeypatch.setattr(gg, "_NATIVE_PATH", "/nonexistent")
    gg._NATIVE = None
    path = str(tmp_path / "t.gguf")
    gg.write_gguf(path, tensors, dtype=dtype)
    back = gg.read_gguf(path)
    assert set(back) == set(tensors)
    for k in tensors:
        assert back[k].shape == tensors[k].shape
        np.testing.assert_allclose(back[k], tensors[k], atol=atol, rtol=2e-3)
    gg._NATIVE = None


@pytest.mark.skipif(not os.path.exists(gg._NATIVE_PATH),
                    reason="native codec not built")
@pytest.mark.parametrize("dtype", ["f32", "f16"])
def test_cross_backend_parity(tmp_path, tensors, dtype, monkeypatch):
    """Files written by the C++ codec read identically through the python
    one, and vice versa."""
    p_native = str(tmp_path / "n.gguf")
    p_python = str(tmp_path / "p.gguf")

    gg._NATIVE = None
    gg.write_gguf(p_native, tensors, dtype=dtype)          # native write
    monkeypatch.setattr(gg, "_NATIVE_PATH", "/nonexistent")
    gg._NATIVE = None
    gg.write_gguf(p_python, tensors, dtype=dtype)          # python write
    py_read_native = gg.read_gguf(p_native)                # python read

    monkeypatch.undo()
    gg._NATIVE = None
    native_read_python = gg.read_gguf(p_python)            # native read

    for k in tensors:
        np.testing.assert_array_equal(py_read_native[k], native_read_python[k])
    # and byte-identical files (same layout decisions)
    with open(p_native, "rb") as a, open(p_python, "rb") as b:
        assert a.read() == b.read()
    gg._NATIVE = None


def test_revresnet_gguf_roundtrip(tmp_path):
    import jax

    from vstnet_tpu.config import RevResNetConfig
    from vstnet_tpu.io.gguf import revresnet_from_gguf, revresnet_to_gguf
    from vstnet_tpu.models.revresnet import init_revresnet

    cfg = RevResNetConfig(n_blocks=(1, 1, 1))
    params = init_revresnet(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "model.gguf")
    revresnet_to_gguf(params, path, dtype="f32")
    params2 = revresnet_from_gguf(path)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gguf_q8_0_roundtrip(tmp_path, rng):
    """Q8_0 (32-block f16 scale + int8) read/write: ~0.4% quantization
    error; both the Python and native codecs dequantize it."""
    from vstnet_tpu.io.gguf import read_gguf, write_gguf, _read_python

    t = {
        "w": rng.standard_normal((8, 64)).astype(np.float32),
        "b": (rng.standard_normal(32) * 10).astype(np.float32),
    }
    p = str(tmp_path / "q.gguf")
    write_gguf(p, t, dtype="q8_0")

    for reader in (read_gguf, _read_python):
        back = reader(p)
        for k, v in t.items():
            assert back[k].shape == v.shape
            scale = np.abs(v).max() / 127.0
            np.testing.assert_allclose(back[k], v, atol=scale * 16)
            err = np.abs(back[k] - v).mean() / (np.abs(v).mean() + 1e-9)
            assert err < 0.01, f"{k}: mean rel err {err}"


def test_gguf_q8_0_rejects_bad_size(tmp_path, rng):
    from vstnet_tpu.io.gguf import write_gguf

    with pytest.raises(ValueError, match="32"):
        write_gguf(str(tmp_path / "x.gguf"),
                   {"w": np.ones(33, np.float32)}, dtype="q8_0")


def test_gguf_q4_0_roundtrip(tmp_path, rng):
    """Q4_0 (32-block f16 scale + packed nibbles, x = d*(q-8)): ~3%
    quantization error; both the Python and native codecs dequantize it,
    bit-identically to each other."""
    from vstnet_tpu.io.gguf import read_gguf, write_gguf, _read_python

    t = {
        "w": rng.standard_normal((8, 64)).astype(np.float32),
        "b": (rng.standard_normal(32) * 10).astype(np.float32),
    }
    p = str(tmp_path / "q4.gguf")
    write_gguf(p, t, dtype="q4_0")

    results = []
    for reader in (read_gguf, _read_python):
        back = reader(p)
        results.append(back)
        for k, v in t.items():
            assert back[k].shape == v.shape
            scale = np.abs(v).max() / 8.0
            np.testing.assert_allclose(back[k], v, atol=scale * 1.01)
            err = np.abs(back[k] - v).mean() / (np.abs(v).mean() + 1e-9)
            assert err < 0.15, f"{k}: mean rel err {err}"
    for k in t:  # native and Python dequant agree exactly
        np.testing.assert_array_equal(results[0][k], results[1][k])


def test_gguf_q4_0_rejects_bad_size(tmp_path, rng):
    from vstnet_tpu.io.gguf import write_gguf

    with pytest.raises(ValueError, match="32"):
        write_gguf(str(tmp_path / "x.gguf"),
                   {"w": np.ones(33, np.float32)}, dtype="q4_0")
