"""Checkpointing: named-leaf npz pytree snapshots + torch-ckpt import shim.

Capability parity with reference `utils/__init__.py:109-136` (`load_ckpt` with
key-prefix filtering, non-strict): our checkpoints store every leaf under a
path-derived name, and `load_torch_ckpt` maps the reference's published
Lightning checkpoints (`nerf_coarse.*` / `nerf_fine.*` prefixes) onto our
param pytrees so quality parity can be validated against released weights.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def save_pytree(path: str, tree) -> None:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    arrays = {_path_str(p): np.asarray(v) for p, v in flat}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **arrays)


def load_pytree(path: str, like):
    """Load leaves saved by save_pytree into the structure of `like`."""
    data = np.load(path, allow_pickle=False)
    flat, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for p, v in flat:
        key = _path_str(p)
        if key not in data:
            raise KeyError(f"checkpoint {path} missing leaf {key}")
        arr = data[key]
        if arr.shape != np.asarray(v).shape:
            raise ValueError(
                f"shape mismatch for {key}: ckpt {arr.shape} vs model "
                f"{np.asarray(v).shape}"
            )
        leaves.append(arr.astype(np.asarray(v).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def load_pytree_nonstrict(path: str, like, prefixes_to_ignore=()):
    """Non-strict load, mirroring reference `utils/__init__.py:109-136`:
    leaves present in the checkpoint (and not under an ignored prefix, and
    shape-compatible) are taken from it; everything else keeps the value from
    `like`. Extra checkpoint keys are silently dropped.
    """
    raw = np.load(path, allow_pickle=False)
    # accept full train ckpts too: their param leaves live under "params/"
    if any(k.startswith("params/") for k in raw.files):
        data = {k[len("params/"):]: raw[k] for k in raw.files
                if k.startswith("params/")}
    else:
        data = {k: raw[k] for k in raw.files}
    flat, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    n_named = 0  # ckpt keys that name a model leaf (any shape)
    for p, v in flat:
        key = _path_str(p)
        want = np.asarray(v)
        if key in data:
            n_named += 1
        if (key in data and data[key].shape == want.shape
                and not any(key.startswith(pre) or f"/{pre}" in f"/{key}"
                            for pre in prefixes_to_ignore)):
            leaves.append(data[key].astype(want.dtype))
        else:
            leaves.append(want)
    if n_named == 0:
        raise KeyError(f"checkpoint {path} shares no leaves with the model")
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_train_ckpt(path: str, params, opt_state, step: int, epoch: int) -> None:
    save_pytree(path, {"params": params, "step": np.asarray(step),
                       "epoch": np.asarray(epoch), "opt": opt_state})


def load_train_ckpt(path: str, params_like, opt_like):
    tree = load_pytree(
        path,
        {"params": params_like, "step": np.asarray(0), "epoch": np.asarray(0),
         "opt": opt_like},
    )
    return tree["params"], tree["opt"], int(tree["step"]), int(tree["epoch"])


# ---- torch checkpoint interop -------------------------------------------


def _torch_linear(sd: dict, prefix: str) -> dict:
    """One torch nn.Linear -> our {"w": (in,out), "b": (out,)} layout."""
    w = np.asarray(sd[f"{prefix}.weight"], np.float32).T  # torch is (out, in)
    out = {"w": w}
    if f"{prefix}.bias" in sd:
        out["b"] = np.asarray(sd[f"{prefix}.bias"], np.float32)
    return out


def torch_mirror_nerf_to_params(sd: dict, model_prefix: str, depth: int = 8) -> dict:
    """Map one reference MirrorNeRF module's state-dict (keys like
    `nerf_fine.xyz_encoding_1.0.weight`, see `models/mirror_nerf.py:59-99`)
    onto our param pytree."""
    sub = {
        k[len(model_prefix) + 1:]: v
        for k, v in sd.items()
        if k.startswith(model_prefix + ".")
    }
    params = {
        "trunk": [
            _torch_linear(sub, f"xyz_encoding_{i + 1}.0") for i in range(depth)
        ],
        "sigma": _torch_linear(sub, "sigma"),
        "xyz_final": _torch_linear(sub, "xyz_encoding_final"),
        "dir_enc": _torch_linear(sub, "dir_encoding.0"),
        "rgb": _torch_linear(sub, "rgb.0"),
    }
    if any(k.startswith("normal_net") for k in sub):
        params["normal"] = [
            _torch_linear(sub, "normal_net.0"),
            _torch_linear(sub, "normal_net.1"),
        ]
    if any(k.startswith("is_mirror_net") for k in sub):
        params["is_mirror"] = [
            _torch_linear(sub, "is_mirror_net.0"),
            _torch_linear(sub, "is_mirror_net.2"),
        ]
    return params


def load_torch_ckpt(path: str, want_fine: bool = True) -> dict:
    """Load a reference Lightning .ckpt into {"coarse": ..., "fine": ...}."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    out = {"coarse": torch_mirror_nerf_to_params(sd, "nerf_coarse")}
    if want_fine and any(k.startswith("nerf_fine.") for k in sd):
        out["fine"] = torch_mirror_nerf_to_params(sd, "nerf_fine")
    return out


def load_params_any(path: str, params_like: dict) -> dict:
    """Load params from either our npz checkpoints (raw pytree or full train
    ckpt) or a reference torch Lightning .ckpt (prefix-mapped)."""
    if path.endswith(".npz"):
        data = np.load(path)
        if any(k.startswith("params/") for k in data.files):
            tree = load_pytree(path, {"params": params_like,
                                      "step": np.asarray(0),
                                      "epoch": np.asarray(0)})
            return tree["params"]
        return load_pytree(path, params_like)
    return load_torch_ckpt(path, want_fine="fine" in params_like)
