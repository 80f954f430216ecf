"""Whitted-style recursive ray tracer over the volume renderer.

Capability parity with the reference's recursion, which is duplicated in
`train.py:129-348` (`render_rays_chunk_recursively`) and `eval.py:132-725`.
Here it exists once, as a statically-unrolled bounce loop inside one jittable
function:

  * recursion depth is static (`max_recursive_level`), so the Python-level
    recursion unrolls at trace time into a single XLA program;
  * the reference's boolean compaction of secondary rays
    (`only_trace_rays_in_mirrors`, train.py:248-252) becomes masked blending —
    all rays are traced, non-mirror lanes are multiplied by 0. Same math,
    static shapes, no host round-trips;
  * the `mirror_mask.any()` early-outs (train.py:172-176) are dropped — XLA
    cannot skip work on data-dependent predicates without a `cond`, and in the
    reflection stage batches essentially always contain mirror pixels.

Gradient-flow notes (load-bearing for training dynamics):
  * the resolved mirror mask is always stop-gradiented (it comes from GT or a
    thresholded detached prediction), so the blend trains the reflection
    *colors*, and the mask head only via its own BCE loss;
  * the surface normal used for the reflection direction keeps gradients
    unless `detach_normal_in_reflection`;
  * `detach_ref_color_for_blend` (active after the geometry stage) stops
    gradients into the reflected branch of the blend.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..core.mathutil import l2_normalize, reflect
from .renderer import RenderSettings, render_rays

# offset pushing secondary-ray origins off the mirror surface
# (reference train.py:232: ray_forward_offset = 0.1)
RAY_FORWARD_OFFSET = 0.1


@dataclass(frozen=True)
class TraceSettings:
    """Static trace configuration (hashable; resolved per stage/epoch)."""

    render: RenderSettings = RenderSettings()
    # True when tracing is enabled AND we are past the geometry stage
    trace_secondary_rays: bool = True
    max_recursive_level: int = 1
    # "train": use the CLI flag at every level (reference train.py:248)
    # "eval":  level 0 traces everything, deeper levels compact to mirror rays
    #          (hardcoded in reference eval.py:159)
    only_trace_mode: str = "train"
    only_trace_rays_in_mirrors: bool = False
    detach_normal_in_reflection: bool = False
    # resolved from detach_ref_color_for_blend AND epoch >= geo_end+1
    # (reference train.py:284-289)
    detach_ref_color_for_blend: bool = False
    is_eval: bool = False
    # Fixed-capacity compaction of secondary rays (the static-shape analog of
    # the reference's boolean compaction, train.py:250-252): at levels where
    # only_in_mirrors holds, pack the mirror rays into a compact_frac·N
    # buffer with a cumsum-scatter (no sort), trace only those, scatter
    # results back. Exact whenever the mirror-pixel count fits the capacity;
    # 1.0 disables (trace everything).
    compact_frac: float = 1.0
    # Reduced sample budget for secondary (level >= 1) bundles: when set,
    # every bounce below level 0 renders with THESE RenderSettings instead
    # of `render`. Constructed by callers as a dataclasses.replace of
    # `render` with smaller N_samples/N_importance (everything else must
    # match — in particular fine_pass, which names the result keys the
    # blend reads). None = same budget at every level (reference behavior).
    secondary_render: "RenderSettings | None" = None
    # Also compact the level-0 secondary trace. The reference traces ALL
    # level-0 secondaries (eval.py:159: only_in_mirrors starts at level 1) —
    # but the blended rgb only consumes the secondary color where the mirror
    # mask is 1, so compacting level 0 leaves the final rgb mathematically
    # unchanged (the `_reflect` visualization buffers become mirror-only,
    # like deeper levels already are). Big eval speedup: skips a full render
    # of every non-mirror pixel's reflection.
    compact_level0: bool = False

    def only_in_mirrors(self, level: int) -> bool:
        if self.only_trace_mode == "eval":
            return level >= 1
        return self.only_trace_rays_in_mirrors

    def compact_at(self, level: int) -> bool:
        return self.only_in_mirrors(level) or (level == 0 and
                                               self.compact_level0)

    @property
    def select_type(self) -> str:
        return "fine" if self.render.fine_pass == "fine" else "coarse"


def _resolve_mirror_mask(ts, results, gt_mask, level):
    """Hard {0,1} mirror mask for this bounce (reference train.py:154-166)."""
    sel = None
    for typ in ("fine", "coarse"):
        if f"mirror_mask_{typ}" in results:
            sel = results[f"mirror_mask_{typ}"]
            break
    if sel is None:
        return jnp.zeros(gt_mask.shape, gt_mask.dtype)
    pred = (jax.lax.stop_gradient(sel) > 0.5).astype(gt_mask.dtype)
    if level > 0:
        return pred
    gt_invalid = jnp.any(gt_mask < 0)
    return jnp.where(gt_invalid, pred, gt_mask)


def _surface_normal(ts, results):
    """Normal driving the reflection (reference train.py:194-215): the
    predicted head if present, else the σ-gradient normal."""
    sel = ts.select_type
    if f"surface_normal_{sel}" in results:
        n = results[f"surface_normal_{sel}"]
    elif f"pred_normal_{sel}" in results:
        n = jnp.sum(
            results[f"pred_normal_{sel}"]
            * results[f"weights_{sel}"][..., None],
            axis=1,
        )
    elif f"surface_normal_grad_{sel}" in results:
        n = results[f"surface_normal_grad_{sel}"]
    else:
        n = jnp.sum(
            results[f"normal_{sel}"] * results[f"weights_{sel}"][..., None],
            axis=1,
        )
    if ts.detach_normal_in_reflection:
        n = jax.lax.stop_gradient(n)
    return l2_normalize(n)


def next_level_settings(field, ts):
    """TraceSettings for the next (deeper) bounce level.

    Deeper bundles with a predicted-normal field never consume their
    σ-gradient normals (reflection uses the head's normal; normal losses
    read the TOP-level dict only; `sec` keeps rgb_/depth_ keys) — skip the
    grad-normal computation there. Saves a full density-vjp (or fused
    tangent) pass over every secondary sample in training. The disable is
    applied to BOTH the next render and the carried secondary_render so it
    stays sticky across recursion levels (ADVICE r4: level+2 re-derives its
    render from secondary_render).

    Secondary bundles may also run at a reduced sample budget
    (`secondary_render`) — a static-shape TPU knob the reference's CUDA
    path has no analog of (eval.py renders every level at N_samples +
    N_importance); quality-gated per checkpoint (BASELINE.md round 4).
    """
    from dataclasses import replace as _dc_replace

    rs_next = ts.secondary_render if ts.secondary_render is not None \
        else ts.render
    sec_next = ts.secondary_render
    if field.predict_normal and rs_next.compute_normal:
        rs_next = _dc_replace(rs_next, compute_normal=False)
    if field.predict_normal and sec_next is not None \
            and sec_next.compute_normal:
        sec_next = _dc_replace(sec_next, compute_normal=False)
    return ts if (rs_next is ts.render
                  and sec_next is ts.secondary_render) else _dc_replace(
                      ts, render=rs_next, secondary_render=sec_next)


def trace_rays(
    field,
    params: dict,
    rays: jnp.ndarray,  # (N, 8)
    mirror_mask_gt: jnp.ndarray,  # (N,) float GT mask (-1 sentinel allowed)
    rng: jax.Array,
    ts: TraceSettings,
    level: int = 0,
    mirror_mask_prev=None,  # (N,) float resolved mask of the parent bounce
) -> dict:
    k_render, k_next = jax.random.split(jax.random.fold_in(rng, level))
    results = render_rays(
        field, params, rays, k_render, ts.render, mirror_mask_gt=mirror_mask_gt
    )

    sel = ts.select_type
    mirror_mask = _resolve_mirror_mask(ts, results, mirror_mask_gt, level)
    if (not ts.only_in_mirrors(level)) and level > 0 and mirror_mask_prev is not None:
        mirror_mask = mirror_mask * jax.lax.stop_gradient(mirror_mask_prev)

    do_trace = ts.trace_secondary_rays and level < ts.max_recursive_level
    if not do_trace:
        if ts.is_eval:
            for typ in ("coarse", "fine"):
                if f"rgb_{typ}" in results:
                    results[f"rgb_{typ}_reflect"] = jnp.zeros_like(
                        results[f"rgb_{typ}"])
                    results[f"rgb_{typ}_direct"] = jnp.zeros_like(
                        results[f"rgb_{typ}"])
            if f"depth_{sel}" in results:
                results[f"depth_{sel}_reflect"] = jnp.zeros_like(
                    results[f"depth_{sel}"])
                results["secondary_rays_o"] = jnp.zeros_like(results[f"rgb_{sel}"])
                results["reflect_direction"] = jnp.zeros_like(results[f"rgb_{sel}"])
        results["mirror_mask_resolved"] = mirror_mask
        return results

    rays_d = rays[:, 3:6]
    far = rays[:, 7:8]

    secondary_o = results[f"x_surface_{sel}"]
    normal = _surface_normal(ts, results)
    reflect_dir = reflect(rays_d, normal)

    secondary_rays = jnp.concatenate(
        [
            secondary_o,
            reflect_dir,
            jnp.full_like(far, RAY_FORWARD_OFFSET),
            far,
        ],
        axis=-1,
    )

    ts_next = next_level_settings(field, ts)

    n = rays.shape[0]
    compact = (ts.compact_frac < 1.0 and ts.compact_at(level)
               and int(n * ts.compact_frac) < n)
    if compact:
        # Sort-free fixed-capacity compaction: mirror rays keep their flat
        # order and land in a cumsum-assigned slot; everything else is never
        # traced (its reflection is blended with weight 0 anyway). Exact as
        # long as the mirror-ray count fits the capacity; overflow drops the
        # last mirror rays in flat order.
        cap = min(max((int(n * ts.compact_frac) + 127) // 128 * 128, 128), n)
        keep = jax.lax.stop_gradient(mirror_mask) > 0.5
        pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
        valid = keep & (pos < cap)
        slot = jnp.where(valid, pos, cap)  # cap = drop bucket

        def _compact(arr):
            buf = jnp.zeros((cap + 1,) + arr.shape[1:], arr.dtype)
            return buf.at[slot].set(arr, mode="drop")[:cap]

        sec_sub = trace_rays(
            field, params, _compact(secondary_rays),
            _compact(mirror_mask_gt), k_next, ts_next, level=level + 1,
            mirror_mask_prev=_compact(mirror_mask),
        )
        pos_c = jnp.minimum(pos, cap - 1)

        def _expand(v):
            g = v[pos_c]
            mask = valid.reshape((n,) + (1,) * (v.ndim - 1))
            return jnp.where(mask, g, jnp.zeros((), v.dtype))

        sec = {k: _expand(v) for k, v in sec_sub.items()
               if k.startswith(("rgb_", "depth_"))}
        # Overflow guard (the 7.6 dB footgun, STATUS.md r2): per-ray
        # indicator of mirror rays silently dropped past capacity at this
        # level, plus any drops at deeper levels (expanded back to this
        # level's index space). Consumers sum it: the trainer hard-fails
        # on >1% overflow, eval warns per view.
        dropped = (keep & ~valid).astype(jnp.float32)
        if "compact_dropped" in sec_sub:
            dropped = dropped + _expand(sec_sub["compact_dropped"])
        results["compact_dropped"] = dropped
    else:
        sec = trace_rays(
            field, params, secondary_rays, mirror_mask_gt, k_next, ts_next,
            level=level + 1, mirror_mask_prev=mirror_mask,
        )
        if "compact_dropped" in sec:
            results["compact_dropped"] = sec["compact_dropped"]

    m = mirror_mask[:, None]  # (N, 1), values in {0, 1}, grad-stopped
    for typ in ("coarse", "fine"):
        if f"rgb_{typ}" in results and f"rgb_{typ}" in sec:
            base = results[f"rgb_{typ}"]
            results[f"rgb_{typ}_direct"] = base
            reflection = sec[f"rgb_{typ}"]
            if ts.detach_ref_color_for_blend:
                reflection = jax.lax.stop_gradient(reflection)
            results[f"rgb_{typ}"] = m * reflection + (1.0 - m) * base
            if ts.is_eval:
                if ts.only_in_mirrors(level):
                    results[f"rgb_{typ}_reflect"] = m * sec[f"rgb_{typ}"]
                else:
                    results[f"rgb_{typ}_reflect"] = sec[f"rgb_{typ}"]
    if ts.is_eval:
        if ts.only_in_mirrors(level):
            results[f"depth_{sel}_reflect"] = mirror_mask * sec[f"depth_{sel}"]
        else:
            results[f"depth_{sel}_reflect"] = sec[f"depth_{sel}"]
        results["secondary_rays_o"] = secondary_o
        results["reflect_direction"] = reflect_dir

    results["mirror_mask_resolved"] = mirror_mask
    return results
