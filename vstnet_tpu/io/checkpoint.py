"""Checkpoint interop: PyTorch `.pt`/`.pth` state_dicts <-> JAX pytrees.

The reference ships torch checkpoints with the key schema
(/root/reference/models/RevResNet.py and the GGML name map
/root/reference/project/ggml/src/vstmodel.h:setup_weight_names):

    stack.{i}.conv.{1,4,7}.{weight,bias}                      i in 0..29
    channel_reduction.block_list.{i}.conv.{1,4,7}.{weight,bias}   i in 0..1

This module converts those to/from the vstnet_tpu params pytree
(see vstnet_tpu/models/revresnet.py) with the OIHW -> HWIO weight
transpose NHWC convolutions need. A native msgpack format is provided for
pure-JAX round trips (no torch needed at inference time).
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np
import jax.numpy as jnp


_SEQ_IDX = {"conv1": 1, "conv2": 4, "conv3": 7}


# ---------------------------------------------------------------------------
# torch -> pytree
# ---------------------------------------------------------------------------

def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a torch checkpoint file into {key: numpy array}.

    Accepts both bare state_dicts and {'state_dict': ...} wrappers
    (reference saves both forms, /root/reference/train.py:241-250).
    """
    import torch  # local import: torch only needed for interop

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def _conv_from_torch(sd, prefix: str, dtype):
    out = {}
    for name, idx in _SEQ_IDX.items():
        w = np.asarray(sd[f"{prefix}.conv.{idx}.weight"])  # OIHW
        b = np.asarray(sd[f"{prefix}.conv.{idx}.bias"])
        out[name] = {
            "w": jnp.asarray(w.transpose(2, 3, 1, 0), dtype=dtype),  # HWIO
            "b": jnp.asarray(b, dtype=dtype),
        }
    return out


def revresnet_from_torch(sd: Dict[str, np.ndarray], dtype=jnp.float32) -> Dict:
    """Torch state_dict (numpy values) -> revresnet params pytree."""
    n_stack = 1 + max(
        int(k.split(".")[1]) for k in sd if k.startswith("stack.")
    )
    n_red = 1 + max(
        int(k.split(".")[2])
        for k in sd
        if k.startswith("channel_reduction.block_list.")
    )
    stack = [_conv_from_torch(sd, f"stack.{i}", dtype) for i in range(n_stack)]
    reduction = [
        _conv_from_torch(sd, f"channel_reduction.block_list.{i}", dtype)
        for i in range(n_red)
    ]
    return {"stack": stack, "reduction": reduction}


def tolerant_state_dict(sd: Dict[str, np.ndarray],
                        expected: Dict[str, np.ndarray],
                        label: str = "checkpoint") -> Dict[str, np.ndarray]:
    """Reference GGUF-loader semantics for foreign checkpoints
    (/root/reference/project/ggml/include/ggml_engine.h:400-423): every
    expected tensor that is MISSING from `sd`, or present with the wrong
    shape, is skipped with a warning and keeps the `expected` (initialized)
    value; extra tensors in `sd` (optimizer buffers, other heads) are
    ignored with one summary warning. Returns a complete state_dict the
    strict converters can consume."""
    import warnings

    out = {}
    for k, want in expected.items():
        if k not in sd:
            warnings.warn(f"{label}: missing tensor {k} — "
                          "keeping initialized value")
            out[k] = np.asarray(want)
        elif tuple(np.shape(sd[k])) != tuple(np.shape(want)):
            warnings.warn(
                f"{label}: tensor {k} shape {tuple(np.shape(sd[k]))} != "
                f"expected {tuple(np.shape(want))} — "
                "keeping initialized value")
            out[k] = np.asarray(want)
        else:
            out[k] = np.asarray(sd[k])
    extra = sorted(set(sd) - set(expected))
    if extra:
        warnings.warn(
            f"{label}: {len(extra)} unused tensor(s) ignored "
            f"(e.g. {extra[:3]})")
    return out


def load_revresnet(path: str, dtype=jnp.float32, strict: bool = True,
                   cfg=None, seed: int = 0) -> Dict:
    """Load reference-format .pt/.pth directly into a params pytree.

    strict=False (reference loader behavior, ggml_engine.h:400-423):
    missing / shape-mismatched tensors are skipped with warnings and keep
    their random-init values; requires `cfg` (a RevResNetConfig) to know
    the expected weight tree."""
    sd = load_torch_state_dict(path)
    if not strict:
        if cfg is None:
            raise ValueError("strict=False needs cfg= to size the "
                             "expected weight tree")
        import jax

        from vstnet_tpu.models.revresnet import init_revresnet

        expected = revresnet_to_torch(
            init_revresnet(jax.random.PRNGKey(seed), cfg))
        sd = tolerant_state_dict(sd, expected, label=path)
    return revresnet_from_torch(sd, dtype)


# ---------------------------------------------------------------------------
# pytree -> torch (for parity tests and export back to the reference format)
# ---------------------------------------------------------------------------

def _conv_to_torch(out, branch, prefix: str):
    for name, idx in _SEQ_IDX.items():
        w = np.asarray(branch[name]["w"])  # HWIO
        out[f"{prefix}.conv.{idx}.weight"] = w.transpose(3, 2, 0, 1)  # OIHW
        out[f"{prefix}.conv.{idx}.bias"] = np.asarray(branch[name]["b"])


def revresnet_to_torch(params: Dict) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for i, bp in enumerate(params["stack"]):
        _conv_to_torch(out, bp, f"stack.{i}")
    for i, bp in enumerate(params["reduction"]):
        _conv_to_torch(out, bp, f"channel_reduction.block_list.{i}")
    return out


def save_torch_checkpoint(params: Dict, path: str, wrap: bool = True):
    import torch

    sd = {
        k: torch.from_numpy(np.array(v, copy=True))
        for k, v in revresnet_to_torch(params).items()
    }
    torch.save({"state_dict": sd} if wrap else sd, path)


# ---------------------------------------------------------------------------
# Native msgpack format (flax serialization; no torch dependency)
# ---------------------------------------------------------------------------

def save_native(pytree, path: str):
    from flax import serialization

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(
            _to_numpy_tree(pytree), in_place=False))


def load_native(path: str):
    from flax import serialization

    with open(path, "rb") as f:
        return _to_jnp_tree(serialization.msgpack_restore(f.read()))


def _to_numpy_tree(tree):
    if isinstance(tree, dict):
        return {k: _to_numpy_tree(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return {str(i): _to_numpy_tree(v) for i, v in enumerate(tree)}
    return np.asarray(tree)


def _to_jnp_tree(tree):
    if isinstance(tree, dict):
        keys = list(tree.keys())
        if keys and all(k.isdigit() for k in keys):
            return [_to_jnp_tree(tree[str(i)]) for i in range(len(keys))]
        return {k: _to_jnp_tree(v) for k, v in tree.items()}
    return jnp.asarray(tree)
