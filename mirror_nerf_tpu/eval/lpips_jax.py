"""LPIPS(alex) perceptual distance, forward pass in pure jnp.

Capability parity with the reference's `lpips.LPIPS(net="alex")`
(`tools/eval_metrics.py:25-32`, `eval.py:926-928`). The architecture is the
published one (Zhang et al. 2018): inputs in [-1, 1] are channel-shifted /
scaled, pushed through the torchvision-AlexNet feature stack, and the five
post-ReLU taps are channel-unit-normalized, squared-differenced, weighted by
learned non-negative 1x1 "lin" convs, spatially averaged, and summed.

Pretrained weights cannot be fetched in this environment (zero egress), so
the forward activates only when a weight file is supplied (path argument or
`LPIPS_WEIGHTS` env var). Two formats are accepted:

- ``.npz`` with keys ``conv{i}/w`` (OIHW), ``conv{i}/b`` for i in 0..4 and
  ``lin{i}/w`` (1D, length = tap channels) — our canonical export.
- a torch ``.pt``/``.pth`` file whose state dict combines torchvision
  AlexNet keys (``features.{0,3,6,8,10}.weight/bias``, any prefix ending in
  those names) and lpips lin keys (``lin{i}.model.1.weight``), i.e. what
  you get by merging ``torchvision.models.alexnet`` weights with the lpips
  package's ``alex.pth``.

The conv stack is five `lax.conv_general_dilated` calls + two max pools —
entirely MXU/XLA territory, no custom kernel needed.
"""

from __future__ import annotations

import os

import numpy as np

# torchvision AlexNet feature stack: (out_ch, kernel, stride, pad),
# with a 3x3/stride-2 max pool before stages 1 and 2.
_ALEX = ((64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1),
         (256, 3, 1, 1), (256, 3, 1, 1))
_POOL_BEFORE = (1, 2)  # max-pool precedes these stage indices

# LPIPS ScalingLayer constants (inputs in [-1, 1])
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _load_weights(path: str) -> dict:
    """Return {conv{i}/w, conv{i}/b, lin{i}/w} as numpy arrays."""
    if path.endswith(".npz"):
        data = np.load(path)
        return {k: data[k] for k in data.files}
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()
          if hasattr(v, "shape")}
    feat_idx = (0, 3, 6, 8, 10)
    out = {}
    for i, fi in enumerate(feat_idx):
        for kind in ("weight", "bias"):
            matches = [v for k, v in sd.items()
                       if k.endswith(f"features.{fi}.{kind}")]
            if not matches:
                raise KeyError(f"missing AlexNet features.{fi}.{kind}")
            out[f"conv{i}/{'w' if kind == 'weight' else 'b'}"] = matches[0]
    for i in range(5):
        matches = [v for k, v in sd.items()
                   if k.endswith(f"lin{i}.model.1.weight")
                   or k.endswith(f"lins.{i}.model.1.weight")]
        if not matches:
            raise KeyError(f"missing lpips lin{i} weight")
        out[f"lin{i}/w"] = matches[0].reshape(-1)
    return out


def _alex_taps(weights: dict, x):
    """x: (N, 3, H, W) in [-1,1] → list of 5 post-ReLU feature maps."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    h = (x - _SHIFT.reshape(1, 3, 1, 1)) / _SCALE.reshape(1, 3, 1, 1)
    taps = []
    for i, (_, k, s, p) in enumerate(_ALEX):
        if i in _POOL_BEFORE:
            h = lax.reduce_window(h, -jnp.inf, lax.max, (1, 1, 3, 3),
                                  (1, 1, 2, 2), "VALID")
        w = jnp.asarray(weights[f"conv{i}/w"])
        b = jnp.asarray(weights[f"conv{i}/b"])
        h = lax.conv_general_dilated(
            h, w, window_strides=(s, s), padding=[(p, p), (p, p)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        h = jax.nn.relu(h + b.reshape(1, -1, 1, 1))
        taps.append(h)
    return taps


def lpips_forward(weights: dict, img0, img1) -> float:
    """LPIPS distance between (H, W, 3) images in [0, 1]."""
    import jax.numpy as jnp

    def prep(im):
        a = jnp.asarray(im, jnp.float32)
        if a.ndim == 3:
            a = a[None]
        return a.transpose(0, 3, 1, 2) * 2.0 - 1.0

    t0 = _alex_taps(weights, prep(img0))
    t1 = _alex_taps(weights, prep(img1))
    total = 0.0
    for i, (f0, f1) in enumerate(zip(t0, t1)):
        n0 = f0 / jnp.sqrt(jnp.sum(f0 ** 2, axis=1, keepdims=True) + 1e-10)
        n1 = f1 / jnp.sqrt(jnp.sum(f1 ** 2, axis=1, keepdims=True) + 1e-10)
        d = (n0 - n1) ** 2
        lin = jnp.asarray(weights[f"lin{i}/w"]).reshape(1, -1, 1, 1)
        total = total + jnp.mean(jnp.sum(d * lin, axis=1), axis=(1, 2))
    return float(total[0])


_CACHE: dict = {}


def lpips_from_file(img0, img1, weights_path: str | None = None) -> float:
    """LPIPS(alex) given a weight file; NaN when no weights are available."""
    weights_path = weights_path or os.environ.get("LPIPS_WEIGHTS", "")
    if not weights_path or not os.path.exists(weights_path):
        return float("nan")
    if weights_path not in _CACHE:
        _CACHE[weights_path] = _load_weights(weights_path)
    return lpips_forward(_CACHE[weights_path], img0, img1)
