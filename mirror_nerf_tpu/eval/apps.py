"""Eval-side tracing + the four applications.

Capability parity with reference `eval.py:114-740` (`batched_inference` and
its recursive closure). The eval tracer differs from the training tracer on
purpose, mirroring the reference's divergences (SURVEY §3.3):
  * the mirror mask always comes from the thresholded prediction (no GT);
  * `only_trace_rays_in_mirrors` is hardcoded to level >= 1 — here that's the
    masked-blend equivalent (level 0 blends everywhere the mask is on);
  * only the *select* type (fine) is blended;
  * rendering is deterministic (perturb=0, noise=0) and `test_time` skips the
    coarse rgb pass.

Applications (all flag-compatible with the reference CLI):
  * place_new_mirror (eval.py:364-504): inject a virtual planar mirror —
    ray/plane intersection, rectangle clip, on-ray check, depth occlusion;
    overrides normal / mirror mask / depth / secondary origins.
  * control_mirror_roughness (eval.py:506-511, 623-674): Monte-Carlo glossy
    reflection — trace `trace_ray_times`+1 bundles with Gaussian-perturbed
    normals and average. The bundle loop runs on the host around ONE compiled
    bundle function (the reference recompiles nothing either — it just loops).
  * reflection_substitution (eval.py:550-613): secondary rays rendered in a
    second checkpoint's radiance field, with scene-specific rigid transforms.
  * reflect_newly_placed_objects (eval.py:173-291): a guest object field
    (D-NeRF / vanilla NeRF) rendered along the same rays and depth-composited
    in before mask resolution; composited pixels clear the mirror mask, so
    the object appears in mirrors via the secondary rays.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.mathutil import l2_normalize
from ..render.renderer import RenderSettings, render_rays
from ..render.tracer import RAY_FORWARD_OFFSET


# ---- scene-preset tables (reference eval.py:369-433, 551-594, 178-189) ----


@dataclass(frozen=True)
class PlaneMirrorSpec:
    axis: int  # 0 = plane x=v, 1 = plane y=v
    value: float
    normal: Tuple[float, float, float]
    rec_bound: Tuple[float, float, float, float]


def plane_preset(plane_pos: str, root_dir: str) -> PlaneMirrorSpec:
    if plane_pos == "plane_x":
        if "livingroom" in root_dir:
            return PlaneMirrorSpec(0, 0.0, (-1, 0, 0), (-1, 1, -0.5, 0.5))
        if "washroom" in root_dir:
            return PlaneMirrorSpec(0, -1.0, (1, 0, 0), (-1, 1, -1, 0.75))
        if "office" in root_dir:
            return PlaneMirrorSpec(0, 1.0, (1, 0, 0), (-1, 1, -1, 0.75))
        return PlaneMirrorSpec(0, -1.0, (1, 0, 0), (-1, 1, -0.5, 0.5))
    else:  # plane_y
        if "washroom" in root_dir:
            return PlaneMirrorSpec(1, 1.3, (0, -1, 0), (-1, 1, -1, 1))
        if "livingroom" in root_dir:
            return PlaneMirrorSpec(1, 1.65, (0, -1, 0), (-0.3, 1.5, -0.5, 1))
        if "office" in root_dir:
            return PlaneMirrorSpec(1, 0.0, (0, -1, 0), (-1, 1, -0.5, 0.5))
        return PlaneMirrorSpec(1, 1.0, (0, -1, 0), (-1, 1, -0.5, 0.5))


def substitution_transform(root_dir: str):
    """(rotation 3x3 or None, translation, scale) for the substituted field."""
    if "office" in root_dir:
        return None, (0.0, 1.0, 0.0), 1.0
    if "market" in root_dir:
        rot = np.array([[0, 1, 0], [-1, 0, 0], [0, 0, 1]], np.float32)
        return rot, (0.0, 0.0, 0.0), 1.0
    return None, (0.0, 0.0, 0.0), 1.0


def object_transform(root_dir: str):
    """(translation, scale) mapping scene rays into the object field."""
    if "livingroom" in root_dir:
        return (0.0, 0.0, 0.0), 2.0
    if "washroom" in root_dir:
        return (-0.5, -0.5, 0.0), 2.0
    if "office" in root_dir:
        return (0.0, 3.0, 0.5), 2.0
    return (0.0, 0.0, 0.0), 1.0


# ---- static eval-trace configuration ----


@dataclass(frozen=True)
class EvalAppFlags:
    place_new_mirror: Optional[PlaneMirrorSpec] = None
    roughness: bool = False
    substitution: bool = False
    reflect_objects: bool = False
    near: float = 0.05  # for the valid-depth occlusion masks


def _resolve_pred_mask(results, sel):
    for key in (f"mirror_mask_{sel}", "mirror_mask_fine", "mirror_mask_coarse"):
        if key in results:
            return (results[key] > 0.5).astype(jnp.float32)
    return None


def _surface_normal_eval(results, sel):
    if f"surface_normal_{sel}" in results:
        return results[f"surface_normal_{sel}"]
    if f"pred_normal_{sel}" in results:
        return jnp.sum(results[f"pred_normal_{sel}"]
                       * results[f"weights_{sel}"][..., None], axis=1)
    if f"surface_normal_grad_{sel}" in results:
        return results[f"surface_normal_grad_{sel}"]
    return jnp.sum(results[f"normal_{sel}"]
                   * results[f"weights_{sel}"][..., None], axis=1)


def _inject_plane_mirror(app: EvalAppFlags, rays, results, sel, mirror_mask,
                         normal, secondary_o):
    """Virtual planar mirror (reference eval.py:364-504), fully masked."""
    spec = app.place_new_mirror
    o, d = rays[:, 0:3], rays[:, 3:6]
    ax = spec.axis
    other = [(1, 2), (0, 2)][ax]  # in-plane coordinate axes for the rect clip
    t = (spec.value - o[:, ax]) / jnp.where(jnp.abs(d[:, ax]) < 1e-9, 1e-9,
                                            d[:, ax])
    hit = o + t[:, None] * d  # (N, 3) intersection with the infinite plane
    u, v = hit[:, other[0]], hit[:, other[1]]
    b = spec.rec_bound
    new_mask = (u >= b[0]) & (u <= b[1]) & (v >= b[2]) & (v <= b[3])
    # on the ray (not its reverse extension)
    new_mask = new_mask & (jnp.sum((hit - o) * d, axis=-1) > 0)
    # foreground occlusion by the rendered scene depth
    depth = results[f"depth_{sel}"]
    depth_new = jnp.linalg.norm(o - hit, axis=-1)
    blocked = (depth_new > depth) & (depth > app.near)
    new_mask = new_mask & ~blocked

    nm = new_mask[:, None]
    normal = jnp.where(nm, jnp.asarray(spec.normal, normal.dtype), normal)
    secondary_o = jnp.where(nm, hit, secondary_o)
    mirror_mask = jnp.where(new_mask, 1.0, mirror_mask)
    depth = jnp.where(new_mask, depth_new, depth)
    results[f"depth_{sel}"] = depth
    for key in (f"mirror_mask_{sel}", "mirror_mask_fine", "mirror_mask_coarse"):
        if key in results:
            results[key] = mirror_mask
            break
    return results, mirror_mask, normal, secondary_o


def _composite_object(app: EvalAppFlags, obj_render_fn, rays, results, sel,
                      frame_time):
    """Depth-composite a guest object field (reference eval.py:173-291)."""
    translation, scale = obj_render_fn.transform
    rays_obj = rays.at[:, 0:3].multiply(scale).at[:, 0:3].add(
        jnp.asarray(translation, rays.dtype))
    obj = obj_render_fn(rays_obj, frame_time)  # {"rgb", "depth", "opacity"}
    obj_depth = obj["depth"] / scale
    depth = results[f"depth_{sel}"]
    mask_obj = (obj_depth > 0) & (obj["opacity"] > 0.8)
    blocked = (obj_depth > depth) & (depth > app.near)
    use_obj = mask_obj & ~blocked
    results[f"rgb_{sel}"] = jnp.where(use_obj[:, None], obj["rgb"],
                                      results[f"rgb_{sel}"])
    results[f"depth_{sel}"] = jnp.where(use_obj, obj_depth, depth)
    for key in (f"mirror_mask_{sel}", "mirror_mask_fine",
                "mirror_mask_coarse"):
        if key in results:
            results[key] = jnp.where(use_obj, 0.0, results[key])
            break
    return results


def eval_trace(
    field,
    params: dict,
    rays: jnp.ndarray,
    rng: jax.Array,
    rs: RenderSettings,
    app: EvalAppFlags,
    max_recursive_level: int,
    trace_secondary_rays: bool,
    level: int = 0,
    subst_params: Optional[dict] = None,
    subst_field=None,
    obj_render_fn: Optional[Callable] = None,
    frame_time: float = 0.0,
    normal_noise: Optional[jnp.ndarray] = None,  # (N, 3) roughness noise
    compact_frac: float = 1.0,
    compact_from_level: int = 1,
    rs_secondary: Optional[RenderSettings] = None,
) -> dict:
    """One eval render level + (optionally) the traced reflection below it."""
    if level > 0 and rs_secondary is not None:
        # reduced secondary sample budget (static-shape TPU knob; see
        # TraceSettings.secondary_render) — all bounces below level 0
        # render with rs_secondary
        rs = rs_secondary
    k_render, k_next = jax.random.split(jax.random.fold_in(rng, level))
    results = render_rays(field, params, rays, k_render, rs)
    sel = "fine" if rs.fine_pass == "fine" else "coarse"

    results[f"rgb_{sel}_reflect"] = jnp.zeros_like(results[f"rgb_{sel}"])
    results[f"depth_{sel}_reflect"] = jnp.zeros_like(results[f"depth_{sel}"])

    if app.reflect_objects and obj_render_fn is not None:
        results = _composite_object(app, obj_render_fn, rays, results, sel,
                                    frame_time)

    mirror_mask = _resolve_pred_mask(results, sel)
    if mirror_mask is None:
        mirror_mask = jnp.zeros(rays.shape[0], jnp.float32)

    do_trace = (trace_secondary_rays or app.place_new_mirror is not None) \
        and level < max_recursive_level
    if not do_trace:
        results["mirror_mask_resolved"] = mirror_mask
        return results

    d = rays[:, 3:6]
    far = rays[:, 7:8]
    secondary_o = results[f"x_surface_{sel}"]
    normal = _surface_normal_eval(results, sel)

    if app.place_new_mirror is not None and level == 0:
        results, mirror_mask, normal, secondary_o = _inject_plane_mirror(
            app, rays, results, sel, mirror_mask, normal, secondary_o)

    if level == 0:
        # unperturbed surface normal, exported for the roughness bundles
        results["_normal_presmooth"] = normal
    if normal_noise is not None and level == 0:
        normal = normal + normal_noise

    normal = l2_normalize(normal)
    w = l2_normalize(-d)
    cos = jnp.sum(w * normal, axis=-1, keepdims=True)
    reflect_dir = 2.0 * cos * normal - w
    results["reflect_direction"] = reflect_dir
    results["secondary_rays_o"] = secondary_o

    secondary = jnp.concatenate(
        [secondary_o, reflect_dir, jnp.full_like(far, RAY_FORWARD_OFFSET), far],
        axis=-1)

    def _trace_bundle(bundle):
        """Render a secondary-ray bundle: substitution field or recursion."""
        if app.substitution and subst_params is not None:
            rot, translation, scale = None, (0, 0, 0), 1.0
            if hasattr(subst_field, "transform"):
                rot, translation, scale = subst_field.transform
            so = bundle[:, 0:3]
            sd = bundle[:, 3:6]
            if rot is not None:
                R = jnp.asarray(rot, so.dtype)
                so = so @ R.T
                sd = l2_normalize(sd @ R.T)
            so = so * scale + jnp.asarray(translation, so.dtype)
            bundle = jnp.concatenate([so, sd, bundle[:, 6:8]], axis=-1)
            sf = subst_field.field if hasattr(subst_field, "field") else field
            return render_rays(sf, subst_params, bundle, k_next,
                               rs_secondary if rs_secondary is not None
                               else rs)
        return eval_trace(
            field, params, bundle, k_next, rs, app, max_recursive_level,
            trace_secondary_rays, level + 1, subst_params, subst_field,
            obj_render_fn, frame_time, None, compact_frac, compact_from_level,
            rs_secondary)

    n = rays.shape[0]
    compact = (compact_frac < 1.0 and level >= compact_from_level
               and int(n * compact_frac) < n)
    if compact:
        # fixed-capacity compaction of the secondary bundle — the reference
        # eval compacts to mirror rays at level >= 1 (eval.py:159,548); here
        # mirror rays land in cumsum-assigned slots (no sort) and results
        # scatter back; non-mirror rays are never traced (blend weight 0).
        cap = min(max((int(n * compact_frac) + 127) // 128 * 128, 128), n)
        keep = mirror_mask > 0.5
        pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
        valid = keep & (pos < cap)
        slot = jnp.where(valid, pos, cap)
        buf = jnp.zeros((cap + 1,) + secondary.shape[1:], secondary.dtype)
        sec_sub = _trace_bundle(buf.at[slot].set(secondary, mode="drop")[:cap])
        pos_c = jnp.minimum(pos, cap - 1)

        def _expand(v):
            mask = valid.reshape((n,) + (1,) * (v.ndim - 1))
            return jnp.where(mask, v[pos_c], jnp.zeros((), v.dtype))

        sec = {k: _expand(v) for k, v in sec_sub.items()
               if k.startswith(("rgb_", "depth_"))}
        # overflow guard: per-ray indicator of mirror rays dropped past
        # capacity (here + deeper levels); eval.py warns per view on any
        dropped = (keep & ~valid).astype(jnp.float32)
        if "compact_dropped" in sec_sub:
            dropped = dropped + _expand(sec_sub["compact_dropped"])
        results["compact_dropped"] = dropped
    else:
        sec = _trace_bundle(secondary)
        if "compact_dropped" in sec:
            results["compact_dropped"] = sec["compact_dropped"]

    m = mirror_mask[:, None]
    base = results[f"rgb_{sel}"]
    results[f"rgb_{sel}_direct"] = base
    results[f"rgb_{sel}"] = m * sec[f"rgb_{sel}"] + (1.0 - m) * base
    results[f"rgb_{sel}_reflect"] = (
        sec[f"rgb_{sel}"] if level == 0 else m * sec[f"rgb_{sel}"])
    results[f"depth_{sel}_reflect"] = (
        sec[f"depth_{sel}"] if level == 0 else mirror_mask * sec[f"depth_{sel}"])
    results["mirror_mask_resolved"] = mirror_mask
    results["_sec_rgb"] = sec[f"rgb_{sel}"]  # for roughness averaging
    return results


# ---- host-side orchestration ----


@dataclass
class AppContext:
    cfg: object
    args: object
    field: object
    params: dict
    rs: RenderSettings
    app: EvalAppFlags
    # reduced secondary-bounce sample budget (None = same as rs); see
    # eval.py --secondary_N_samples/--secondary_N_importance
    rs_sec: Optional[RenderSettings] = None
    subst_field: object = None
    subst_params: Optional[dict] = None
    obj_render_fn: Optional[Callable] = None
    jit_cache: dict = None  # (compact_frac, has_noise) -> compiled trace
    # SPMD eval: 1-D data mesh (reference --num_gpus DDP-eval analog,
    # train.py:30). Rays are sharded over the data axis per chunk; params
    # are replicated; XLA partitions the whole trace.
    mesh: object = None

    def put_batch(self, x):
        """Device-put a leading-axis array, sharded when a mesh is set."""
        if self.mesh is None:
            return jnp.asarray(x)
        from ..parallel.mesh import batch_sharding

        return jax.device_put(jnp.asarray(x), batch_sharding(self.mesh))

    def put_blocks(self, x):
        """Device-put a (K, chunk, ...) megabatch block; the chunk axis is
        the sharded one when a mesh is set."""
        if self.mesh is None:
            return jnp.asarray(x)
        from ..parallel.mesh import block_sharding

        return jax.device_put(jnp.asarray(x), block_sharding(self.mesh))

    def traced(self, compact_frac: float, has_noise: bool,
               kblocks: int = 1):
        """One compiled eval trace per (capacity, noise, kblocks) variant.
        frame_time and the roughness noise are *traced* arguments, so every
        view of a split reuses the same executable.

        kblocks > 1 renders K chunks per dispatch via `lax.map` (the scan
        body compiles once, same program as a single chunk) — on a tunneled
        TPU attachment per-dispatch latency otherwise dominates the wall
        clock (measured 2.2x: 450k -> 975k rays/s at K=4, BASELINE.md)."""
        if self.jit_cache is None:
            self.jit_cache = {}
        key = (compact_frac, has_noise, kblocks)
        if key not in self.jit_cache:
            cfg = self.cfg
            if cfg.max_recursive_level > 3 and not (
                    self.app.substitution or self.app.reflect_objects
                    or has_noise):
                # deep recursion (e.g. new-mirror inter-reflections at 50
                # levels): while_loop formulation, one compiled render body.
                # A while_loop body needs level-invariant shapes — which is
                # exactly the per-level-budget semantic: every level >= 1
                # renders at the (single) secondary budget.
                def fn(params, rays, k, frame_time, noise):
                    return eval_trace_deep(
                        self.field, params, rays, k, self.rs, self.app,
                        cfg.max_recursive_level, cfg.trace_secondary_rays,
                        frame_time, rs_secondary=self.rs_sec)
            else:
                def fn(params, rays, k, frame_time, noise):
                    return eval_trace(
                        self.field, params, rays, k, self.rs, self.app,
                        cfg.max_recursive_level, cfg.trace_secondary_rays,
                        subst_params=self.subst_params,
                        subst_field=self.subst_field,
                        obj_render_fn=self.obj_render_fn,
                        frame_time=frame_time,
                        normal_noise=noise if has_noise else None,
                        compact_frac=compact_frac, compact_from_level=1,
                        rs_secondary=self.rs_sec)

            if kblocks > 1:
                base_fn = fn

                def fn(params, rays_k, keys_k, frame_time, noise_k):
                    def body(t):
                        res = base_fn(params, t[0], t[1], frame_time, t[2])
                        # filter inside jit so unused per-sample buffers
                        # (weights/z_vals/per-sample normals) are DCE'd
                        # instead of materialized K-fold
                        return {kk: vv for kk, vv in res.items()
                                if _keep_eval_key(kk)}

                    return jax.lax.map(body, (rays_k, keys_k, noise_k))

            self.jit_cache[key] = jax.jit(fn)
        return self.jit_cache[key]

    def roughness_bundle(self):
        """Compiled secondary-bundle render for the roughness app: perturbed
        normal → reflected rays → one traced render; returns rgb_sel."""
        if self.jit_cache is None:
            self.jit_cache = {}
        if "roughness_bundle" not in self.jit_cache:
            cfg = self.cfg
            sel = "fine" if self.rs.fine_pass == "fine" else "coarse"

            def fn(params, secondary_o, normal_base, rays, noise, key):
                normal = l2_normalize(normal_base + noise)
                d = rays[:, 3:6]
                far = rays[:, 7:8]
                w = l2_normalize(-d)
                cos = jnp.sum(w * normal, axis=-1, keepdims=True)
                reflect_dir = 2.0 * cos * normal - w
                bundle = jnp.concatenate(
                    [secondary_o, reflect_dir,
                     jnp.full_like(far, RAY_FORWARD_OFFSET), far], axis=-1)
                res = eval_trace(
                    self.field, params, bundle, key, self.rs, self.app,
                    cfg.max_recursive_level, cfg.trace_secondary_rays,
                    level=1, rs_secondary=self.rs_sec)
                return res[f"rgb_{sel}"]

            self.jit_cache["roughness_bundle"] = jax.jit(fn)
        return self.jit_cache["roughness_bundle"]

    def roughness_bundles_batched(self):
        """All T+1 Monte-Carlo bundles of the roughness app in ONE dispatch:
        a lax.scan over the per-bundle PRNG keys runs the same perturbed-normal
        secondary render as `roughness_bundle` and accumulates the rgb sum on
        device, so mode 5 pays one tunnel round-trip per chunk instead of
        trace_ray_times+1 (ref eval.py:623-674 loops 64 full CUDA renders).
        Noise is derived from the identical fold_in keys the host loop uses,
        so the result matches the sequential path bitwise."""
        if self.jit_cache is None:
            self.jit_cache = {}
        if "roughness_bundles_k" not in self.jit_cache:
            cfg = self.cfg
            sel = "fine" if self.rs.fine_pass == "fine" else "coarse"

            def one(params, secondary_o, normal_base, rays, key, noise_std):
                noise = jax.random.normal(
                    key, secondary_o.shape, jnp.float32) * noise_std
                normal = l2_normalize(normal_base + noise)
                d = rays[:, 3:6]
                far = rays[:, 7:8]
                w = l2_normalize(-d)
                cos = jnp.sum(w * normal, axis=-1, keepdims=True)
                reflect_dir = 2.0 * cos * normal - w
                bundle = jnp.concatenate(
                    [secondary_o, reflect_dir,
                     jnp.full_like(far, RAY_FORWARD_OFFSET), far], axis=-1)
                res = eval_trace(
                    self.field, params, bundle, key, self.rs, self.app,
                    cfg.max_recursive_level, cfg.trace_secondary_rays,
                    level=1, rs_secondary=self.rs_sec)
                return res[f"rgb_{sel}"]

            def fn(params, secondary_o, normal_base, rays, keys, noise_std):
                def body(acc, key):
                    rgb = one(params, secondary_o, normal_base, rays, key,
                              noise_std)
                    return acc + rgb, None

                init = jnp.zeros(secondary_o.shape[:1] + (3,), jnp.float32)
                total, _ = jax.lax.scan(body, init, keys)
                return total

            self.jit_cache["roughness_bundles_k"] = jax.jit(fn)
        return self.jit_cache["roughness_bundles_k"]

    @classmethod
    def build(cls, cfg, args, field, params):
        rs = RenderSettings(
            N_samples=cfg.N_samples, N_importance=cfg.N_importance,
            use_disp=cfg.use_disp, perturb=0.0, noise_std=0.0,
            white_back=False, test_time=not args.render_coarse_rgb,
            compute_normal=cfg.trace_secondary_rays and not cfg.predict_normal,
            fine_pass=("fine" if cfg.N_importance > 0 and not cfg.only_one_field
                       else ("coarse" if cfg.N_importance > 0 else "none")),
            fused_field=getattr(args, "fused_field", False),
            proposal_drop=getattr(args, "proposal_drop_levels", 0),
            proposal_skip=getattr(args, "proposal_skip", False),
            sigma_activation=getattr(cfg, "sigma_activation", "relu"),
        )
        rs_sec = None
        sec_ns = getattr(args, "secondary_N_samples", -1)
        sec_ni = getattr(args, "secondary_N_importance", -1)
        if sec_ns >= 0 or sec_ni >= 0:
            from dataclasses import replace as _dc_replace

            rs_sec = _dc_replace(
                rs,
                N_samples=sec_ns if sec_ns >= 0 else cfg.N_samples,
                N_importance=sec_ni if sec_ni >= 0 else cfg.N_importance,
            )
            from ..render.renderer import check_secondary_render

            check_secondary_render(rs, rs_sec)
        if getattr(args, "proposal_skip", False) and getattr(
                args, "render_coarse_rgb", False):
            raise ValueError(
                "--proposal_skip renders no coarse pass; drop "
                "--render_coarse_rgb")
        if getattr(args, "proposal_drop_levels", 0) and not (
                getattr(args, "fused_field", False)
                and cfg.model_type == "nerf_tpu"):
            print("[warn] --proposal_drop_levels has no effect without "
                  "--fused_field on model_type nerf_tpu", flush=True)
        app = EvalAppFlags(
            place_new_mirror=(plane_preset(args.plane_pos, cfg.root_dir)
                              if args.app_place_new_mirror else None),
            roughness=args.app_control_mirror_roughness,
            substitution=args.app_reflection_substitution,
            reflect_objects=args.app_reflect_newly_placed_objects,
            near=cfg.near,
        )
        ctx = cls(cfg=cfg, args=args, field=field, params=params, rs=rs,
                  rs_sec=rs_sec, app=app)
        if cfg.num_gpus > 1:
            from ..parallel.mesh import get_mesh, replicate

            ctx.mesh = get_mesh(cfg.num_gpus)
            ctx.params = replicate(ctx.mesh, ctx.params)
        if app.substitution:
            if not args.substitution_ckpt_path:
                raise SystemExit("[Error] substitution_ckpt_path required "
                                 "for app_reflection_substitution.")
            from ..models.fields import make_field

            sub_cfg = cfg.replace(bound=6.0)  # reference forces bound=6
            sub_field = make_field(sub_cfg)
            import jax as _jax

            like = {"coarse": sub_field.init(_jax.random.PRNGKey(0))}
            if cfg.N_importance > 0 and not cfg.only_one_field:
                like["fine"] = sub_field.init(_jax.random.PRNGKey(1))
            from ..train.checkpoints import load_params_any

            class _Sub:
                pass

            s = _Sub()
            s.field = sub_field
            s.transform = substitution_transform(cfg.root_dir)
            ctx.subst_field = s
            ctx.subst_params = load_params_any(args.substitution_ckpt_path,
                                               like, field=sub_field)
        if app.reflect_objects:
            if not args.obj_ckpt_path:
                raise SystemExit("[Error] obj_ckpt_path required for "
                                 "app_reflect_newly_placed_objects.")
            from ..models.guests import make_object_render_fn

            ctx.obj_render_fn = make_object_render_fn(
                cfg, args.obj_model_type, args.obj_ckpt_path,
                transform=object_transform(cfg.root_dir))
        return ctx


def _pad(arr, n):
    pad = n - arr.shape[0]
    if pad <= 0:
        return arr
    return np.concatenate([arr, arr[-1:].repeat(pad, axis=0)], axis=0)


def eval_trace_deep(
    field,
    params: dict,
    rays: jnp.ndarray,
    rng: jax.Array,
    rs: RenderSettings,
    app: EvalAppFlags,
    max_recursive_level: int,
    trace_secondary_rays: bool,
    frame_time=0.0,
    rs_secondary: "RenderSettings | None" = None,
) -> dict:
    """Deep Whitted trace as a `lax.while_loop` (for e.g. the new-mirror
    app's `max_recursive_level=50`, run.sh:147).

    Unrolling 50 bounce levels would explode compile time, and the
    reference's data-dependent early-out (`mirror_mask.any()`,
    eval.py:312-319) cannot be expressed in a static unroll. Restructured
    front-to-back instead: carry (rays, throughput T = Π mirror masks,
    accumulated rgb); each iteration renders ONE level, adds T·(1−m)·base,
    multiplies T by m, reflects the rays — and the loop exits as soon as no
    throughput remains. One compiled render body serves every depth.

    Recursive blend equivalence: (1−m0)b0 + m0[(1−m1)b1 + m1[…]] =
    Σ_L (Π_{j<L} m_j)(1−m_L)·b_L, with the cutoff level contributing its
    full unblended color (m forced to 0 there).

    `rs_secondary`: reduced sample budget for every bounce level >= 1. The
    while_loop body must be shape-invariant across levels, which is exactly
    the per-level-budget semantic (all deeper levels share ONE budget):
    level 0 renders at `rs` outside the loop, the body renders at
    `rs_secondary`. Key structure (has_fine) must match `rs`
    (check_secondary_render).
    """
    from ..render.renderer import check_secondary_render

    check_secondary_render(rs, rs_secondary)
    sel = "fine" if rs.fine_pass == "fine" else "coarse"
    n = rays.shape[0]

    def render_level(rays_l, level, key, rs_l=rs):
        res = render_rays(field, params, rays_l, key, rs_l)
        mask = _resolve_pred_mask(res, sel)
        if mask is None:
            mask = jnp.zeros(n, jnp.float32)
        secondary_o = res[f"x_surface_{sel}"]
        normal = _surface_normal_eval(res, sel)
        if app.place_new_mirror is not None:
            # the virtual mirror exists physically: inject at EVERY level so
            # inter-reflections happen (the reference closure runs the
            # injection at each recursion level)
            res, mask, normal, secondary_o = _inject_plane_mirror(
                app, rays_l, res, sel, mask, normal, secondary_o)
        normal = l2_normalize(normal)
        d = rays_l[:, 3:6]
        w = l2_normalize(-d)
        cos = jnp.sum(w * normal, axis=-1, keepdims=True)
        reflect_dir = 2.0 * cos * normal - w
        far = rays_l[:, 7:8]
        nxt = jnp.concatenate(
            [secondary_o, reflect_dir,
             jnp.full_like(far, RAY_FORWARD_OFFSET), far], axis=-1)
        return res, mask, nxt, secondary_o, reflect_dir

    # level 0 outside the loop: its full results dict (viz keys) is returned
    k0, kloop = jax.random.split(rng)
    res0, m0, rays1, sec_o0, refl0 = render_level(rays, 0, k0)
    results = dict(res0)
    results["secondary_rays_o"] = sec_o0
    results["reflect_direction"] = refl0
    base0 = res0[f"rgb_{sel}"]

    do_trace = (trace_secondary_rays or app.place_new_mirror is not None) \
        and max_recursive_level > 0
    if not do_trace:
        results[f"rgb_{sel}_reflect"] = jnp.zeros_like(base0)
        results[f"depth_{sel}_reflect"] = jnp.zeros_like(res0[f"depth_{sel}"])
        results["mirror_mask_resolved"] = m0
        return results

    def cond(carry):
        level, _, T, _, _, _ = carry
        return jnp.logical_and(level <= max_recursive_level,
                               jnp.any(T > 0.0))

    rs_loop = rs_secondary if rs_secondary is not None else rs

    def body(carry):
        level, rays_l, T, rgb_acc, ref_rgb, ref_depth = carry
        key = jax.random.fold_in(kloop, level)
        res, m, nxt, _, _ = render_level(rays_l, level, key, rs_loop)
        # cutoff: the last allowed level contributes unblended
        m = jnp.where(level >= max_recursive_level, 0.0, m)
        base = res[f"rgb_{sel}"]
        rgb_acc = rgb_acc + T[:, None] * (1.0 - m[:, None]) * base
        # level-1 values feed the reflect visualizations
        ref_rgb = jnp.where(level == 1, base, ref_rgb)
        ref_depth = jnp.where(level == 1, res[f"depth_{sel}"], ref_depth)
        T = T * m
        return level + 1, nxt, T, rgb_acc, ref_rgb, ref_depth

    init = (jnp.asarray(1), rays1, m0,
            (1.0 - m0[:, None]) * base0,
            jnp.zeros_like(base0), jnp.zeros_like(m0))
    _, _, _, rgb_acc, ref_rgb, ref_depth = jax.lax.while_loop(cond, body, init)

    results[f"rgb_{sel}_direct"] = base0
    results[f"rgb_{sel}"] = rgb_acc
    # reflect viz = the fully blended secondary color, masked to the mirror
    # (the unrolled eval shows it unmasked at level 0; viz-only difference)
    results[f"rgb_{sel}_reflect"] = rgb_acc - (1.0 - m0[:, None]) * base0
    results[f"depth_{sel}_reflect"] = m0 * ref_depth
    results["mirror_mask_resolved"] = m0
    del ref_rgb  # carried only to keep the loop state static
    return results


CAPACITY_BUCKETS = (0.125, 0.25, 0.5, 1.0)


def _keep_eval_key(kk: str) -> bool:
    """Eval output filter: drop per-sample buffers the writers never read."""
    return not (kk.startswith(("weights_", "z_vals_", "normal_",
                               "pred_normal_", "_"))
                and kk != "normal_dif_fine")


def estimate_mirror_fraction(ctx: AppContext, rays_all: np.ndarray,
                             key: jax.Array) -> float:
    """Cheap low-res prepass: level-0 mirror-mask fraction of this view.

    Used to pick the secondary-ray capacity bucket per view — the host-side
    analog of the reference's dynamic boolean compaction (eval.py:548), with
    static shapes per bucket.
    """
    n = rays_all.shape[0]
    stride = max(n // 2048, 1)
    sub = rays_all[::stride][:2048]
    if len(sub) < 2048:
        sub = np.concatenate(
            [sub, sub[-1:].repeat(2048 - len(sub), axis=0)], axis=0)
    if ctx.jit_cache is None:
        ctx.jit_cache = {}
    if "prepass" not in ctx.jit_cache:
        def fn(params, rays, k):
            return eval_trace(
                ctx.field, params, rays, k, ctx.rs, ctx.app,
                max_recursive_level=0, trace_secondary_rays=False,
                obj_render_fn=ctx.obj_render_fn,
            )["mirror_mask_resolved"]

        ctx.jit_cache["prepass"] = jax.jit(fn)
    mask = np.asarray(ctx.jit_cache["prepass"](ctx.params, jnp.asarray(sub),
                                               key))
    return float(mask.mean())


def pick_capacity(frac: float) -> float:
    """Smallest capacity bucket covering the estimate with safety margin."""
    need = min(frac * 1.3 + 0.03, 1.0)
    for b in CAPACITY_BUCKETS:
        if b >= need:
            return b
    return 1.0


def run_view(ctx: AppContext, sample: dict, progress: float,
             key: jax.Array) -> dict:
    """Render one full view through fixed-size chunks; returns numpy dict."""
    cfg, args = ctx.cfg, ctx.args
    rays_all = np.asarray(sample["rays"], np.float32)
    n = rays_all.shape[0]
    chunk = min(cfg.chunk, n)
    if ctx.mesh is not None:  # sharded chunks must divide the data axis
        ndev = ctx.mesh.devices.size
        chunk = max(((chunk + ndev - 1) // ndev) * ndev, ndev)

    progress_cycle = progress * 2 if progress < 0.5 else 1 - (progress - 0.5) * 2
    noise_std = (args.normal_noise_std * progress_cycle
                 if args.normal_noise_std_changes else args.normal_noise_std)

    # adaptive secondary-ray capacity (exact while mirror pixels fit; the
    # new-mirror app changes the mask after level 0, so it traces everything)
    if cfg.trace_secondary_rays and ctx.app.place_new_mirror is None \
            and cfg.max_recursive_level > 0:
        frac = estimate_mirror_fraction(ctx, rays_all, key)
        compact_frac = pick_capacity(frac)
    else:
        compact_frac = 1.0

    # Megabatch: K chunks per dispatch (lax.map inside one jit) — amortizes
    # per-dispatch tunnel latency, the dominant wall cost on this attachment
    # (BASELINE.md: 450k -> 975k rays/s). Per-chunk math is IDENTICAL to the
    # K=1 path (same chunk shapes, same fold_in keys). The roughness app
    # keeps K=1: its secondary bundles are orchestrated on the host.
    meg = int(getattr(args, "megabatch", 0) or 0)
    if meg <= 0:
        meg = 4 if jax.default_backend() == "tpu" else 1
    if ctx.app.roughness:
        meg = 1
    meg = max(min(meg, (n + chunk - 1) // chunk), 1)

    ft = jnp.float32(progress)

    def run_chunk(rays_np, k, normal_noise=None):
        traced = ctx.traced(compact_frac, has_noise=ctx.app.roughness)
        if normal_noise is None:
            normal_noise = jnp.zeros((rays_np.shape[0], 3), jnp.float32)
        return traced(ctx.params, ctx.put_batch(rays_np), k, ft,
                      ctx.put_batch(normal_noise))

    def run_block(rays_k_np, keys_k):
        traced_k = ctx.traced(compact_frac, has_noise=False, kblocks=meg)
        noise_k = jnp.zeros(rays_k_np.shape[:2] + (3,), jnp.float32)
        return traced_k(ctx.params, ctx.put_blocks(rays_k_np), keys_k, ft,
                        ctx.put_blocks(noise_k))

    def _block(start):
        """(meg, chunk, 8) block starting at ray `start`; tail chunks are
        padded by repetition so one program covers every group."""
        parts = []
        for j in range(meg):
            s = min(start + j * chunk, max(n - 1, 0))
            parts.append(_pad(rays_all[s:s + chunk], chunk))
        return np.stack(parts, axis=0)

    def _block_keys(start):
        return jnp.stack([jax.random.fold_in(key, min(start + j * chunk, n))
                          for j in range(meg)])

    # very large trace graphs can trip internal libtpu compiler bugs
    # (register-allocation RET_CHECKs); probe the first chunk and halve on
    # INTERNAL compile failures. The working chunk is memoized per
    # (capacity, megabatch): a FAILED compile is not cached by jax, so
    # without this every view would re-pay the failed 32768 compile.
    if ctx.jit_cache is None:
        ctx.jit_cache = {}
    cache_key = ("good_chunk", compact_frac, meg)
    chunk = min(ctx.jit_cache.get(cache_key, chunk), chunk)
    while chunk > 256:
        try:
            if meg > 1:
                run_block(_block(0), _block_keys(0))
            else:
                run_chunk(_pad(rays_all[:chunk], chunk), key)
            break
        except Exception as e:  # noqa: BLE001
            if "INTERNAL" not in str(e):
                raise
            print(f"[warn] eval trace compile failed at chunk={chunk}; "
                  f"retrying with {chunk // 2}")
            chunk //= 2  # same jitted fn retraces at the smaller shape
            if ctx.mesh is not None:  # keep the data-axis divisibility
                ndev = ctx.mesh.devices.size
                chunk = max(((chunk + ndev - 1) // ndev) * ndev, ndev)
            meg = max(min(meg, (n + chunk - 1) // chunk), 1)
    ctx.jit_cache[cache_key] = chunk

    if meg > 1 and not ctx.app.roughness:
        # dispatch every block, fetch afterwards: the host never blocks on
        # an in-flight render while later dispatches wait
        pend = []
        for start in range(0, n, chunk * meg):
            res = run_block(_block(start), _block_keys(start))
            pend.append((start, res))
        outs = {}
        for start, res in pend:
            valid = min(chunk * meg, n - start)
            for kk, vv in res.items():
                v = np.asarray(vv).reshape((-1,) + vv.shape[2:])
                outs.setdefault(kk, []).append(v[:valid])
        return {kk: np.concatenate(v, 0) for kk, v in outs.items()}

    outs = {}
    for start in range(0, n, chunk):
        r = _pad(rays_all[start:start + chunk], chunk)
        valid = min(chunk, n - start)
        k = jax.random.fold_in(key, start)

        if not ctx.app.roughness:
            res = run_chunk(r, k)
        else:
            # Monte-Carlo glossy reflection: render the BASE view once, then
            # trace trace_ray_times+1 perturbed-normal secondary bundles and
            # average — the reference loops only the secondary renders too
            # (eval.py:625-660); re-rendering the base per bundle would
            # double the cost.
            T = args.trace_ray_times
            base = {kk: np.asarray(vv)
                    for kk, vv in run_chunk(r, k, normal_noise=jnp.zeros(
                        (chunk, 3), jnp.float32)).items()}
            sel = "fine" if ctx.rs.fine_pass == "fine" else "coarse"
            keys = jnp.stack([jax.random.fold_in(k, t) for t in range(T + 1)])
            if os.environ.get("MNERF_ROUGHNESS_HOST_LOOP", "0") == "1":
                acc = None  # sequential fallback: one dispatch per bundle
                bundle = ctx.roughness_bundle()
                for t in range(T + 1):
                    kt = jax.random.fold_in(k, t)
                    noise = jax.random.normal(kt, (chunk, 3)) * noise_std
                    sec_rgb = np.asarray(bundle(
                        ctx.params, ctx.put_batch(base["secondary_rays_o"]),
                        ctx.put_batch(base["_normal_presmooth"]),
                        ctx.put_batch(r), ctx.put_batch(noise), kt))
                    acc = sec_rgb if acc is None else acc + sec_rgb
            else:
                acc = np.asarray(ctx.roughness_bundles_batched()(
                    ctx.params, ctx.put_batch(base["secondary_rays_o"]),
                    ctx.put_batch(base["_normal_presmooth"]),
                    ctx.put_batch(r), keys,
                    jnp.float32(noise_std)))
            sec_mean = acc / (T + 1)
            m = base["mirror_mask_resolved"][:, None]
            base[f"rgb_{sel}"] = (m * sec_mean
                                  + (1 - m) * base[f"rgb_{sel}_direct"])
            base[f"rgb_{sel}_reflect"] = sec_mean
            res = base

        for kk, vv in res.items():
            if kk.startswith(("weights_", "z_vals_", "normal_", "pred_normal_",
                              "_")) and kk != "normal_dif_fine":
                continue
            v = np.asarray(vv)
            outs.setdefault(kk, []).append(v[:valid])
    return {kk: np.concatenate(v, 0) for kk, v in outs.items()}
