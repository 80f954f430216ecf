"""CP-factorized multiscale feature grid — the TPU-native fast encoder.

Role parity with the reference's hash-grid encoder (`models/gridencoder/`,
used by MirrorNeRFTcnn "For speedup", run.sh:5) but designed for TPU physics
instead of GPU caches. A spatial hash table requires per-sample random access;
measured on this chip, XLA's gather sustains only ~66-260 M rows/s regardless
of row width (index-rate-bound), and Mosaic's in-kernel `dynamic_gather`
spans a single 8-sublane vreg — both orders of magnitude short of the
~37 G rows/s a hash-grid eval at competitive ray rates needs. Random access
is the wrong primitive on this hardware.

The CP (CANDECOMP/PARAFAC, TensoRF-style) decomposition replaces it with
*structured* access: per axis a dense 1-D table A_axis ∈ (G, R); the feature
of a point is the rank-wise product of three linearly-interpolated rows,

    feat_r(x, y, z) = ax_r(x) · ay_r(y) · az_r(z),

optionally at several resolutions (multiscale), folded to the output width
by a dense matmul. Every step is either elementwise VPU work or an MXU
matmul; the fused eval kernel (ops/pallas/fused_cp.py) builds the two-point
interpolation weights in VMEM as a *one-hot-lerp basis* and evaluates the
table read itself as `basis @ A` — a matmul, no gather anywhere.

This module is the differentiable XLA reference implementation (training +
CPU tests): interpolation by paired `jnp.take` (backward = scatter-add, the
analog of the CUDA atomicAdd backward in gridencoder.cu:274-382), plus the
1-D total-variation regularizer mirroring `tv_loss` of the hash grid.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class CPGridSpec:
    # (resolution, rank) per scale; ranks concatenate before the fold matmul
    levels: Tuple[Tuple[int, int], ...] = ((64, 64), (256, 64), (512, 64))
    n_features: int = 32  # fold output width (matches the hash grid's 32)
    input_dim: int = 3

    @property
    def total_rank(self) -> int:
        return sum(r for _, r in self.levels)

    @property
    def output_dim(self) -> int:
        return self.n_features


def init_cpgrid(key: jax.Array, spec: CPGridSpec, dtype=jnp.float32) -> dict:
    """axes[a][l]: (G_l, R_l) tables; fold: (ΣR, F).

    Tables start near 1 (product identity) with small noise — products of
    near-unit factors keep early features O(1) at any rank, mirroring
    TensoRF's 0.1-scale init after the per-rank product.
    """
    params = {"axes": [], "fold": None}
    n_axes = spec.input_dim
    keys = jax.random.split(key, n_axes * len(spec.levels) + 1)
    ki = 0
    for a in range(n_axes):
        tables = []
        for (g, r) in spec.levels:
            noise = jax.random.normal(keys[ki], (g, r), dtype) * 0.1
            tables.append(1.0 + noise)
            ki += 1
        params["axes"].append(tables)
    bound = 1.0 / (spec.total_rank ** 0.5)
    params["fold"] = jax.random.uniform(
        keys[ki], (spec.total_rank, spec.n_features), dtype, -bound, bound)
    return params


def _lerp_rows(table: jnp.ndarray, x01: jnp.ndarray,
               compute_dtype) -> jnp.ndarray:
    """Linearly interpolated rows of a (G, R) table at x01 ∈ [0,1]: (N, R)."""
    g = table.shape[0]
    xf = jnp.clip(x01, 0.0, 1.0) * (g - 1)
    xi = jnp.floor(xf).astype(jnp.int32)
    xi = jnp.minimum(xi, g - 2)
    w = (xf - xi).astype(compute_dtype)[:, None]
    t = table.astype(compute_dtype)
    a = jnp.take(t, xi, axis=0)
    b = jnp.take(t, xi + 1, axis=0)
    return a * (1.0 - w) + b * w


def _lerp_rows_dense(table: jnp.ndarray, x01: jnp.ndarray,
                     compute_dtype) -> jnp.ndarray:
    """The same interpolated rows as `_lerp_rows`, evaluated as a hat-basis
    MATMUL: B[n,j] = max(0, 1 − |x_n·(G−1) − j|) (built in fp32, at most two
    nonzeros per row) and rows = B @ table. Identical math to the paired
    take (for x ∈ [0,1] the two hat weights ARE (1−w, w) at (xi, xi+1)),
    but both the forward and every derivative XLA needs are matmuls:
        d table = Bᵀ @ d rows      (the gather path lowers this to
                                    scatter-add, which is index-rate-bound
                                    on TPU — BASELINE.md microbenchmarks)
        d x     = (d rows · table) contracted with the hat slope
    This is the differentiable XLA analog of the fused eval kernel's
    in-VMEM basis matmul (ops/pallas/fused_cp.py) and is what training uses
    on TPU; `_lerp_rows` remains for CPU tests / tiny batches.
    """
    g = table.shape[0]
    xf = jnp.clip(x01, 0.0, 1.0).astype(jnp.float32) * (g - 1)
    j = jnp.arange(g, dtype=jnp.float32)
    basis = jnp.maximum(0.0, 1.0 - jnp.abs(xf[:, None] - j[None, :]))
    return jnp.dot(basis.astype(compute_dtype), table.astype(compute_dtype),
                   preferred_element_type=compute_dtype)


def cpgrid_encode(params: dict, x01: jnp.ndarray, spec: CPGridSpec,
                  compute_dtype=jnp.float32, lookup: str = "auto"
                  ) -> jnp.ndarray:
    """(N, input_dim) in [0,1] -> (N, n_features).

    Out-of-[0,1] inputs are clamped to the boundary (the hash grid maps them
    to zero features; for CP the clamp is the natural choice — the boundary
    rows are trained, and σ there is driven to empty by the data itself).

    lookup: "gather" = paired jnp.take (backward scatter-add);
            "dense"  = hat-basis matmul (backward matmul — the TPU path);
            "auto"   = dense on TPU, gather elsewhere.
    """
    if lookup == "auto":
        lookup = "dense" if jax.default_backend() == "tpu" else "gather"
    rows_fn = _lerp_rows_dense if lookup == "dense" else _lerp_rows
    per_level = []
    for li in range(len(spec.levels)):
        prod = None
        for a in range(spec.input_dim):
            rows = rows_fn(params["axes"][a][li], x01[:, a],
                           compute_dtype)
            prod = rows if prod is None else prod * rows
        per_level.append(prod)
    feats = jnp.concatenate(per_level, axis=-1)
    return jnp.dot(feats, params["fold"].astype(compute_dtype),
                   preferred_element_type=compute_dtype)


def cpgrid_tv_loss(params: dict) -> jnp.ndarray:
    """Mean squared difference of adjacent table rows over all axes/levels —
    the 1-D analog of the hash grid's total-variation gradient
    (gridencoder.cu:584-752), exposed as a differentiable loss."""
    total = 0.0
    n = 0
    for tables in params["axes"]:
        for t in tables:
            d = t[1:] - t[:-1]
            total = total + jnp.sum(d * d)
            n += d.size
    return total / max(n, 1)
