"""Multiresolution hash-grid encoder (Instant-NGP style), TPU-native.

Capability parity with the reference CUDA extension
(`models/gridencoder/src/gridencoder.cu`, wrapper `grid.py`): per level ℓ a
feature grid at resolution ceil((2^(ℓS)·H−1))+1 — dense when it fits the
per-level table, spatially hashed (xor of coordinate·prime) when it doesn't —
trilinearly interpolated at x·scale+0.5, with out-of-[0,1] inputs mapped to
zero features. `desired_resolution` overrides per_level_scale exactly like
`grid.py:159-163`; per-level table sizes are rounded up to 8.

Everything is expressed as 2^D static gathers + a weighted sum, so:
  * embedding gradients are XLA scatter-adds (the exact counterpart of the
    CUDA backward's atomicAdd, gridencoder.cu:274-382) — no atomics needed;
  * input gradients fall out of autodiff through the interpolation weights,
    which equals the reference's analytic `dy_dx` path (the floor() is
    piecewise-constant, exactly as in the CUDA kernel);
  * a Pallas kernel can later replace the gather loop without changing the
    interface (see ops/pallas/).

The total-variation gradient op (gridencoder.cu:584-752) is exposed as
`tv_loss` — a differentiable loss whose jax.grad equals the reference's
in-place grad injection.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# the reference's spatial-hash primes (gridencoder.cu:55-56); the identity
# prime on dim 0 keeps close x-coords in close buckets
_PRIMES = (1, 2654435761, 805459861, 3674653429, 2097192037, 1434869437,
           2165219737)


@dataclass(frozen=True)
class LevelSpec:
    resolution: int  # grid cells per side: ceil(scale)+1
    scale: float  # 2^(level*S)*H - 1
    offset: int  # row offset into the flat table
    size: int  # rows in this level's table
    use_hash: bool
    dense_strides: Tuple[int, ...]  # per-dim stride while stride <= size


@dataclass(frozen=True)
class HashGridSpec:
    input_dim: int = 3
    num_levels: int = 16
    level_dim: int = 2
    base_resolution: int = 16
    log2_hashmap_size: int = 19
    per_level_scale: float = 2.0
    desired_resolution: int = 0  # >0 overrides per_level_scale
    gridtype: str = "hash"  # "hash" | "tiled"
    align_corners: bool = False
    interpolation: str = "linear"  # "linear" | "smoothstep"

    @property
    def scale_log2(self) -> float:
        if self.desired_resolution:
            return float(
                np.log2(self.desired_resolution / self.base_resolution)
                / (self.num_levels - 1))
        return float(np.log2(self.per_level_scale))

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.level_dim

    def levels(self) -> Tuple[LevelSpec, ...]:
        out = []
        offset = 0
        max_params = 2 ** self.log2_hashmap_size
        for lvl in range(self.num_levels):
            scale = float(np.exp2(lvl * self.scale_log2) * self.base_resolution
                          - 1.0)
            resolution = int(np.ceil(scale)) + 1
            side = resolution if self.align_corners else resolution + 1
            params_in_level = min(max_params, side ** self.input_dim)
            params_in_level = int(np.ceil(params_in_level / 8) * 8)
            # replicate the CUDA index loop statically: accumulate strides
            # while stride <= table size (gridencoder.cu:68-79)
            strides = []
            stride = 1
            for _ in range(self.input_dim):
                strides.append(stride if stride <= params_in_level else 0)
                stride *= side
            use_hash = self.gridtype == "hash" and stride > params_in_level
            out.append(LevelSpec(resolution, scale, offset, params_in_level,
                                 use_hash, tuple(strides)))
            offset += params_in_level
        return tuple(out)

    @property
    def table_rows(self) -> int:
        return self.levels()[-1].offset + self.levels()[-1].size


def init_hashgrid(key: jax.Array, spec: HashGridSpec,
                  dtype=jnp.float32) -> jnp.ndarray:
    """U(-1e-4, 1e-4) init, matching reference grid.py:204-206."""
    return jax.random.uniform(key, (spec.table_rows, spec.level_dim), dtype,
                              -1e-4, 1e-4)


def _fast_hash(pos: jnp.ndarray, d: int) -> jnp.ndarray:
    """xor_i(pos_i * prime_i) over uint32 (gridencoder.cu:51-66)."""
    acc = pos[..., 0] * jnp.uint32(_PRIMES[0])
    for i in range(1, d):
        acc = acc ^ (pos[..., i] * jnp.uint32(_PRIMES[i]))
    return acc


def _corner_indices(spec: HashGridSpec, lv: LevelSpec,
                    pos_grid: jnp.ndarray) -> jnp.ndarray:
    """Row index within the level table for integer corners (..., D)."""
    pos_u = pos_grid.astype(jnp.uint32)
    dense = jnp.zeros(pos_grid.shape[:-1], jnp.uint32)
    for d, stride in enumerate(lv.dense_strides):
        if stride:
            dense = dense + pos_u[..., d] * jnp.uint32(stride)
    idx = _fast_hash(pos_u, spec.input_dim) if lv.use_hash else dense
    return (idx % jnp.uint32(lv.size)).astype(jnp.int32)


def _corner_offsets(d: int) -> np.ndarray:
    return np.array(
        [[(c >> dd) & 1 for dd in range(d)] for c in range(2 ** d)],
        np.int32)  # (2^D, D)


@partial(jax.jit, static_argnames=("spec",))
def hashgrid_encode(table: jnp.ndarray, x: jnp.ndarray,
                    spec: HashGridSpec) -> jnp.ndarray:
    """Encode positions x ∈ [0,1]^D → (N, L*C) features.

    Gradients w.r.t. both `table` (scatter-add) and `x` (through the
    interpolation weights) come from autodiff and match the CUDA backward.
    """
    D = spec.input_dim
    oob = jnp.any((x < 0.0) | (x > 1.0), axis=-1, keepdims=True)  # (N, 1)
    corners = jnp.asarray(_corner_offsets(D))  # (2^D, D)

    outs = []
    for lv in spec.levels():
        pos = x * lv.scale + (0.0 if spec.align_corners else 0.5)
        pos_floor = jnp.floor(pos)
        frac = pos - pos_floor
        if spec.interpolation == "smoothstep":
            frac = frac * frac * (3.0 - 2.0 * frac)
        pg = pos_floor.astype(jnp.int32)  # (N, D)

        # (2^D, N, D) integer corner coords
        cpos = pg[None, :, :] + corners[:, None, :]
        idx = _corner_indices(spec, lv, cpos)  # (2^D, N)
        # trilinear weights: prod_d frac or (1-frac) per corner bit
        w = jnp.prod(
            jnp.where(corners[:, None, :] == 1, frac[None], 1.0 - frac[None]),
            axis=-1)  # (2^D, N)
        feats = table[lv.offset + idx]  # (2^D, N, C)
        level_out = jnp.sum(w[..., None] * feats, axis=0)  # (N, C)
        outs.append(level_out)
    out = jnp.concatenate(outs, axis=-1)  # (N, L*C)
    return jnp.where(oob, 0.0, out)


def tv_loss(table: jnp.ndarray, x: jnp.ndarray, spec: HashGridSpec,
            weight: float = 1e-7) -> jnp.ndarray:
    """Total-variation loss at sampled points: sum over levels/dims of
    squared neighbor differences. jax.grad of this matches the reference's
    `grad_total_variation` injection (gridencoder.cu:584-752)."""
    D = spec.input_dim
    loss = 0.0
    for lv in spec.levels():
        pos = x * lv.scale + (0.0 if spec.align_corners else 0.5)
        pg = jnp.floor(pos).astype(jnp.int32)  # (N, D)
        base_idx = _corner_indices(spec, lv, pg)
        base = table[lv.offset + base_idx]  # (N, C)
        for d in range(D):
            nb = pg.at[:, d].add(1)
            nb = jnp.minimum(nb, lv.resolution - 1)
            nb_idx = _corner_indices(spec, lv, nb)
            diff = base - table[lv.offset + nb_idx]
            loss = loss + jnp.sum(diff * diff)
    return weight * loss / x.shape[0]
