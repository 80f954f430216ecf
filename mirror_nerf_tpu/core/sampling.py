"""Per-ray depth sampling: stratified coarse samples + inverse-CDF importance.

Capability parity with reference `models/rendering.py:7-51` (sample_pdf) and
`:283-300` (stratified/disparity sampling with perturbation), written as pure
jnp with explicit PRNG keys so everything jits and vmaps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def stratified_z_vals(
    rng: jax.Array,
    near: jnp.ndarray,  # (N, 1)
    far: jnp.ndarray,  # (N, 1)
    N_samples: int,
    use_disp: bool = False,
    perturb: float = 0.0,
) -> jnp.ndarray:
    """Coarse depth samples per ray, (N, N_samples).

    Linear in depth (or disparity), optionally jittered within each interval
    the same way the reference does (`rendering.py:283-300`).
    """
    z_steps = jnp.linspace(0.0, 1.0, N_samples, dtype=near.dtype)  # (S,)
    if not use_disp:
        z_vals = near * (1.0 - z_steps) + far * z_steps
    else:
        z_vals = 1.0 / (1.0 / near * (1.0 - z_steps) + 1.0 / far * z_steps)
    # z_vals: (N, S) by broadcasting (near/far are (N,1))
    z_vals = jnp.broadcast_to(z_vals, (near.shape[0], N_samples))

    if perturb > 0.0:
        mids = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
        upper = jnp.concatenate([mids, z_vals[:, -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[:, :1], mids], axis=-1)
        u = jax.random.uniform(rng, z_vals.shape, dtype=z_vals.dtype)
        z_vals = lower + (upper - lower) * (perturb * u)
    return z_vals


def sample_pdf(
    rng: jax.Array,
    bins: jnp.ndarray,  # (N, M+1) interval midpoints of the coarse z_vals
    weights: jnp.ndarray,  # (N, M)
    N_importance: int,
    det: bool = False,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Draw N_importance samples per ray from the piecewise-constant PDF
    defined by `weights` over `bins`.

    Matches the reference inverse-CDF sampler (`rendering.py:7-51`): weights
    are floored by eps, the CDF is zero-padded on the left, `u` is either a
    deterministic linspace or uniform noise, and indices come from a
    right-inclusive searchsorted.
    """
    N_rays, M = weights.shape
    weights = weights + eps
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)  # (N, M+1)

    if det:
        u = jnp.linspace(0.0, 1.0, N_importance, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, (N_rays, N_importance))
    else:
        u = jax.random.uniform(rng, (N_rays, N_importance), dtype=cdf.dtype)

    # TPU-native inverse CDF, entirely gather-free. "searchsorted right"
    # selects the prefix {j : cdf_j <= u}; since both cdf and bins are
    # monotone ascending, cdf[ind-1]/bins[ind-1] are masked *maxima* over the
    # prefix and cdf[ind]/bins[ind] masked *minima* over its complement —
    # pure VPU compare/reduce, no take_along_axis (which lowers to slow
    # per-element gathers on TPU).
    le = cdf[:, None, :] <= u[:, :, None]  # (N, K, M+1) prefix mask
    cdf_b = cdf[:, None, :]
    bins_b = bins[:, None, :]
    neg = jnp.array(-jnp.inf, cdf.dtype)
    pos = jnp.array(jnp.inf, cdf.dtype)
    # the prefix is never empty: cdf_0 = 0 <= u for u in [0, 1]
    cdf_lo = jnp.max(jnp.where(le, cdf_b, neg), axis=-1)
    bin_lo = jnp.max(jnp.where(le, bins_b, neg), axis=-1)
    cdf_hi = jnp.min(jnp.where(le, pos, cdf_b), axis=-1)
    bin_hi = jnp.min(jnp.where(le, pos, bins_b), axis=-1)
    # empty suffix (u >= cdf_M, e.g. u = 1.0): clamp to the last entry,
    # matching the reference's index clamp above = min(ind, M)
    suffix_empty = ~jnp.isfinite(cdf_hi)
    cdf_hi = jnp.where(suffix_empty, cdf[:, -1:], cdf_hi)
    bin_hi = jnp.where(suffix_empty, bins[:, -1:], bin_hi)

    denom = cdf_hi - cdf_lo
    denom = jnp.where(denom < eps, 1.0, denom)  # empty bins are never sampled
    samples = bin_lo + (u - cdf_lo) / denom * (bin_hi - bin_lo)
    return samples


def merge_fine_z_vals(
    rng: jax.Array,
    z_vals: jnp.ndarray,  # (N, S) coarse samples
    weights: jnp.ndarray,  # (N, S) coarse compositing weights
    N_importance: int,
    perturb: float,
    return_origin: bool = False,
):
    """Coarse+fine merged, sorted depth samples, (N, S+N_importance).

    The PDF uses the *interior* coarse weights with gradients stopped, exactly
    like the reference (`rendering.py:312-326,351-356`). With
    `return_origin`, also returns a bool array marking which merged samples
    came from the importance draw (used by early termination, which must
    never skip importance samples).
    """
    z_mid = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
    z_fine = sample_pdf(
        rng,
        z_mid,
        jax.lax.stop_gradient(weights[:, 1:-1]),
        N_importance,
        det=(perturb == 0.0),
    )
    merged = jnp.concatenate([z_vals, z_fine], axis=-1)
    if not return_origin:
        return jnp.sort(merged, axis=-1)
    order = jnp.argsort(merged, axis=-1)
    origin = jnp.concatenate(
        [jnp.zeros_like(z_vals, jnp.bool_),
         jnp.ones_like(z_fine, jnp.bool_)], axis=-1)
    z_sorted = jnp.take_along_axis(merged, order, axis=-1)
    origin_sorted = jnp.take_along_axis(origin, order, axis=-1)
    return z_sorted, origin_sorted
