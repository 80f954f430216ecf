"""Small pure math helpers shared across the framework.

Capability parity with the reference's `utils/func.py` (l2_normalize:5,
binary_cross_entropy:28) and the reflection math in `train.py:219-228`,
re-expressed as pure jnp functions.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_F32_EPS = float(np.finfo(np.float32).eps)


def l2_normalize(x: jnp.ndarray, eps: float = _F32_EPS) -> jnp.ndarray:
    """Normalize to unit length along the last axis (safe at zero)."""
    sq = jnp.sum(x * x, axis=-1, keepdims=True)
    return x * jax_rsqrt_clamped(sq, eps)


def jax_rsqrt_clamped(sq: jnp.ndarray, eps: float) -> jnp.ndarray:
    import jax.lax as lax

    return lax.rsqrt(jnp.maximum(sq, eps))


def reflect(d: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Mirror-reflect incident direction `d` about unit normal `n`.

    Matches reference `train.py:219-228`: with w = normalize(-d) the outgoing
    direction is r = 2 (n·w) n − w. `n` must already be unit length.
    """
    w = l2_normalize(-d)
    cos = jnp.sum(w * n, axis=-1, keepdims=True)
    return 2.0 * cos * n - w


def binary_cross_entropy(p: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Elementwise BCE on probabilities (caller clamps p away from {0,1})."""
    return -(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p))


def mse(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - gt) ** 2)


def psnr(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return -10.0 * jnp.log10(mse(pred, gt))


def masked_mean(values: jnp.ndarray, mask: jnp.ndarray, axis=None) -> jnp.ndarray:
    """Mean of `values` where `mask` (broadcastable) is true.

    Safe when the mask is empty (returns 0 instead of NaN) — the reference's
    fancy-indexed `.mean()` would NaN there; batches in practice always contain
    both classes, so this only diverges on the degenerate case.
    """
    mask = mask.astype(values.dtype)
    num = jnp.sum(values * mask, axis=axis)
    den = jnp.sum(mask * jnp.ones_like(values), axis=axis)
    return num / jnp.maximum(den, 1.0)
