"""Frequency (sinusoidal) positional encoding.

Capability parity with the reference `Embedding` module
(`models/mirror_nerf.py:6-38`): output layout is
[x, sin(2^0 x), cos(2^0 x), ..., sin(2^(N-1) x), cos(2^(N-1) x)]
with the raw input included, so N_freqs=10 on 3-d input gives 63 channels and
N_freqs=4 gives 27. Pure jnp — XLA fuses this into the surrounding matmuls.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def posenc_dim(in_dim: int, n_freqs: int) -> int:
    return in_dim * (1 + 2 * n_freqs)


def posenc(x: jnp.ndarray, n_freqs: int, logscale: bool = True) -> jnp.ndarray:
    """Embed (..., F) -> (..., F*(1+2*n_freqs)). n_freqs=0 is the identity."""
    if n_freqs == 0:
        return x
    if logscale:
        freqs = 2.0 ** np.linspace(0.0, n_freqs - 1, n_freqs)
    else:
        freqs = np.linspace(1.0, 2.0 ** (n_freqs - 1), n_freqs)
    # One fused (..., F, n_freqs) block, then interleave sin/cos per frequency
    # to match the reference's [sin(f0 x), cos(f0 x), sin(f1 x), ...] layout.
    xf = x[..., None] * jnp.asarray(freqs, dtype=x.dtype)  # (..., F, L)
    sin = jnp.sin(xf)
    cos = jnp.cos(xf)
    # (..., L, 2, F): per frequency -> [sin(f*x_0..x_F), cos(f*x_0..x_F)]
    inter = jnp.stack([sin, cos], axis=-1)  # (..., F, L, 2)
    inter = jnp.moveaxis(inter, -3, -1)  # (..., L, 2, F)
    flat = inter.reshape(*x.shape[:-1], 2 * n_freqs * x.shape[-1])
    return jnp.concatenate([x, flat], axis=-1)
