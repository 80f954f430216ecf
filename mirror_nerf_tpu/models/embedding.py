"""Frequency (sinusoidal) positional encoding.

Capability parity with the reference `Embedding` module
(`models/mirror_nerf.py:6-38`): output layout is
[x, sin(2^0 x), cos(2^0 x), ..., sin(2^(N-1) x), cos(2^(N-1) x)]
with the raw input included, so N_freqs=10 on 3-d input gives 63 channels and
N_freqs=4 gives 27. Pure jnp — XLA fuses this into the surrounding matmuls.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def posenc_dim(in_dim: int, n_freqs: int) -> int:
    return in_dim * (1 + 2 * n_freqs)


@functools.lru_cache(maxsize=None)
def _posenc_consts(in_dim: int, n_freqs: int, logscale: bool):
    """(in_dim, 2*n_freqs*in_dim) frequency matrix + phase row such that
    sin(x @ M + phase) reproduces the interleaved
    [sin(f0 x), cos(f0 x), sin(f1 x), cos(f1 x), ...] layout
    (cos(z) = sin(z + π/2))."""
    if logscale:
        freqs = 2.0 ** np.linspace(0.0, n_freqs - 1, n_freqs)
    else:
        freqs = np.linspace(1.0, 2.0 ** (n_freqs - 1), n_freqs)
    cols = 2 * n_freqs * in_dim
    M = np.zeros((in_dim, cols), np.float32)
    phase = np.zeros((cols,), np.float32)
    j = 0
    for f in freqs:
        for trig in range(2):  # 0 = sin block, 1 = cos block
            for d in range(in_dim):
                M[d, j] = f
                phase[j] = trig * (np.pi / 2.0)
                j += 1
    return M, phase


def posenc(x: jnp.ndarray, n_freqs: int, logscale: bool = True) -> jnp.ndarray:
    """Embed (..., F) -> (..., F*(1+2*n_freqs)). n_freqs=0 is the identity.

    Output layout matches the reference `Embedding`
    (`models/mirror_nerf.py:21-38`): the raw input followed, per frequency,
    by [sin(f·x), cos(f·x)].

    TPU note: computed as one (F, 2·L·F) matmul plus a single phase-shifted
    `sin` over the already-final layout — no stack/transpose/interleave ops,
    which on TPU would relayout lane-padded minor-dim-3 tensors (measured
    ~4x the cost of the sin itself).
    """
    if n_freqs == 0:
        return x
    M, phase = _posenc_consts(x.shape[-1], n_freqs, logscale)
    z = x @ jnp.asarray(M, x.dtype) + jnp.asarray(phase, x.dtype)
    return jnp.concatenate([x, jnp.sin(z)], axis=-1)
