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


def _tcnn_level_sizes(spec) -> list:
    """tiny-cuda-nn's per-level entry counts for a HashGrid encoding.

    tcnn (GridEncoding, grid.h): scale_l = 2^(l*S)*base - 1,
    resolution_l = ceil(scale_l) + 1, entries = min(2^log2_hashmap,
    resolution^D) rounded UP to a multiple of 8. This differs from the
    vendored gridencoder (our `HashGridSpec.levels`, which pads the dense
    side by one like grid.py:117-124), so a published tcnn blob's levels
    must be copied one-by-one rather than reshaped wholesale.
    """
    sizes = []
    max_params = 2 ** spec.log2_hashmap_size
    for lvl in range(spec.num_levels):
        scale = float(np.exp2(lvl * spec.scale_log2) * spec.base_resolution
                      - 1.0)
        resolution = int(np.ceil(scale)) + 1
        n = min(max_params, resolution ** spec.input_dim)
        sizes.append(int(np.ceil(n / 8) * 8))
    return sizes


def torch_ngp_to_params(sd: dict, model_prefix: str, field,
                        table_like: np.ndarray) -> dict:
    """Map one reference MirrorNeRFTcnn module's state-dict onto NGPField
    params.

    Torch-side layout (`/root/reference/models/mirror_nerf_tcnn.py:36-149`):
      * `encoder.params`: tcnn's flat (possibly fp16) grid blob — level-major,
        entry-major, the 2 features of an entry contiguous;
      * `sigma_net.{i}.weight`, `color_net.{i}.weight`,
        `normal_net.{i}.weight`: bias-free nn.Linear (out,in) -> transposed;
      * `is_mirror_net.{0,2}.weight/.bias`: the biased mirror head.

    The grid blob is copied per level: when the blob's total rows equal our
    table (same rounding) it is reshaped wholesale, otherwise each level's
    leading min(rows) entries are copied (the 8-rounding/dense-side-padding
    tail keeps `table_like`'s values — those rows are never indexed by
    in-range inputs on the smaller layout).
    """
    sub = {
        k[len(model_prefix) + 1:]: v
        for k, v in sd.items()
        if k.startswith(model_prefix + ".")
    }
    spec = field.grid_spec
    blob = np.asarray(sub["encoder.params"], np.float32).reshape(
        -1, spec.level_dim)
    table = np.array(table_like, np.float32, copy=True)
    ours = spec.levels()
    if blob.shape[0] == table.shape[0]:
        table = blob
    else:
        theirs = _tcnn_level_sizes(spec)
        if sum(theirs) != blob.shape[0]:
            raise ValueError(
                f"{model_prefix}.encoder.params has {blob.shape[0]} rows; "
                f"neither our layout ({table.shape[0]}) nor tcnn's "
                f"({sum(theirs)}) for {spec}")
        src_off = 0
        for lv, src_size in zip(ours, theirs):
            n = min(lv.size, src_size)
            table[lv.offset:lv.offset + n] = blob[src_off:src_off + n]
            src_off += src_size
    params = {"grid": table}

    def _nobias_stack(name: str, count: int) -> list:
        return [
            {"w": np.asarray(sub[f"{name}.{i}.weight"], np.float32).T}
            for i in range(count)
        ]

    params["sigma_net"] = _nobias_stack("sigma_net", field.num_layers)
    params["color_net"] = _nobias_stack("color_net", field.num_layers_color)
    if any(k.startswith("normal_net") for k in sub):
        params["normal"] = _nobias_stack("normal_net", field.num_layers)
    if any(k.startswith("is_mirror_net") for k in sub):
        params["is_mirror"] = [
            _torch_linear(sub, "is_mirror_net.0"),
            _torch_linear(sub, "is_mirror_net.2"),
        ]
    return params


def load_torch_ckpt(path: str, want_fine: bool = True,
                    params_like: dict | None = None, field=None) -> dict:
    """Load a reference Lightning .ckpt into {"coarse": ..., "fine": ...}.

    Dispatches on the checkpoint's own keys: `nerf_*.xyz_encoding_1.*` is the
    MirrorNeRF MLP layout (`models/mirror_nerf.py:59-99`),
    `nerf_*.encoder.params` the MirrorNeRFTcnn layout. The NGP mapping needs
    `params_like` (fresh init params, for the table-init values of padding
    rows) and the `field` (NGPField, for the grid spec); when `field` is
    omitted the statics are reconstructed from the param shapes — which
    works for the published default architecture only.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    is_ngp = any(k.endswith("encoder.params") for k in sd)
    sides = ["coarse"]
    if want_fine and any(k.startswith("nerf_fine.") for k in sd):
        sides.append("fine")
    if not is_ngp:
        return {s: torch_mirror_nerf_to_params(sd, f"nerf_{s}") for s in sides}
    if params_like is None:
        raise ValueError("NGP torch ckpts need params_like= for the grid spec")
    from ..models.ngp import NGPField

    out = {}
    for s in sides:
        like = params_like[s]
        f = field
        if f is None or not isinstance(f, NGPField):
            # reconstruct the field statics from the param shapes so plain
            # published ckpts load without threading the config through
            f = NGPField(
                num_layers=len(like["sigma_net"]),
                hidden_dim=like["sigma_net"][0]["w"].shape[1]
                if len(like["sigma_net"]) > 1 else 64,
                geo_feat_dim=like["sigma_net"][-1]["w"].shape[1] - 1,
                num_layers_color=len(like["color_net"]),
                bound=_bound_from_rows(np.asarray(like["grid"]).shape[0]),
                predict_normal="normal" in like,
                predict_mirror_mask="is_mirror" in like,
            )
        out[s] = torch_ngp_to_params(sd, f"nerf_{s}", f, like["grid"])
    return out


def _bound_from_rows(rows: int) -> float:
    """Invert NGPField.grid_spec's table_rows -> bound (small int search)."""
    from ..models.ngp import NGPField

    for bound in (1, 2, 3, 4, 6, 8, 12, 16, 32):
        if NGPField(bound=float(bound)).grid_spec.table_rows == rows:
            return float(bound)
    raise ValueError(f"no standard bound yields a {rows}-row hash table")


def load_params_any(path: str, params_like: dict, field=None) -> dict:
    """Load params from either our npz checkpoints (raw pytree or full train
    ckpt) or a reference torch Lightning .ckpt (prefix-mapped). `field` (the
    model object) disambiguates non-default NGP grid specs."""
    if path.endswith(".npz"):
        data = np.load(path)
        if any(k.startswith("params/") for k in data.files):
            tree = load_pytree(path, {"params": params_like,
                                      "step": np.asarray(0),
                                      "epoch": np.asarray(0)})
            return tree["params"]
        return load_pytree(path, params_like)
    return load_torch_ckpt(path, want_fine="fine" in params_like,
                           params_like=params_like, field=field)
