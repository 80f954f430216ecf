"""Volume renderer: one jittable pass over a fixed-size ray batch.

Capability parity with reference `models/rendering.py:54-369` (render_rays and
its inner `inference`): stratified coarse sampling, alpha compositing with
σ-noise, inverse-CDF fine resampling over the detached interior coarse
weights, `only_one_field` / `test_time` semantics, mirror-mask and normal
aggregation with the reference's exact stop-gradient variants, and surface
points x = o + d·depth.

TPU-first differences from the torch version:
  * no chunking — the caller picks the batch size; XLA sees one static shape
  * the σ-gradient normal is one batched `jax.vjp`, not per-chunk autograd
  * runtime "is the GT mask valid?" checks become traced scalar predicates
    feeding `jnp.where` gradient gates (values identical, gradients gated)
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..core.mathutil import l2_normalize
from ..core.sampling import merge_fine_z_vals, stratified_z_vals


@dataclass(frozen=True)
class RenderSettings:
    """Static knobs of one render_rays call (hashable; safe to close over)."""

    N_samples: int = 64
    N_importance: int = 128
    use_disp: bool = False
    perturb: float = 1.0
    noise_std: float = 1.0
    white_back: bool = False
    test_time: bool = False
    # compute the σ-gradient (analytic) normal alongside density
    compute_normal: bool = True
    # fine pass behavior (resolved from only_one_field + epoch by the caller):
    #   "fine"   — run the fine model on merged samples (the default twin-field)
    #   "coarse" — re-run the coarse model on merged samples (only_one_field,
    #              past the warm-up epoch; reference rendering.py:328-348)
    #   "none"   — no fine pass (only_one_field during warm-up, or
    #              N_importance == 0)
    fine_pass: str = "fine"
    # stop-gradient plumbing (reference opt.py:211-221)
    detach_density_outside_mirror_for_mask_loss: bool = False
    detach_density_for_mask_loss: bool = False
    detach_density_for_normal_loss: bool = False
    # NOTE (round 3): occupancy-grid empty-space skipping and fine-pass
    # early termination were REMOVED after decisive measurements on a
    # trained checkpoint (BASELINE.md round 3): both knobs route samples
    # through gather/scatter compaction whose index-rate cost exceeds the
    # skipped field work 5-7x on every TPU path (matmul fields don't get
    # cheaper per-sample the way gather-bound CUDA fields do).
    # run the field through the fully-fused Pallas kernel
    # (ops/pallas/fused_mlp.py) — forward-only, so it engages only when the
    # σ-gradient normal is off (eval/bench path). bf16 numerics.
    fused_field: bool = False
    # TRAINING-side fused density+∇σ with a hand-written custom VJP
    # (ops/pallas/fused_cp_train.py). Differentiable incl. grad-of-grad;
    # engages on compute_normal paths of fields that support it.
    fused_density: bool = False
    # bf16-training probe: evaluate the σ-gradient (analytic normal) density
    # pass in fp32 even when the field's compute_dtype is bfloat16 — isolates
    # whether the measured ~2 dB bf16-training generalization loss comes from
    # quantized normal supervision (the only second-order signal in training)
    # or from the bulk forward math.
    fp32_sigma_grad: bool = False
    # generation-2 fused path for the PE-MLP: transposed kernel with
    # in-kernel compositing (applies when fused_field is set and the pass is
    # plain eval — no noise/occupancy/early-term masks)
    fused_t: bool = True
    # proposal-lite (eval-only, CP-grid fused path): truncate this many of
    # the FINEST CP levels in σ-only proposal passes (the coarse pass whose
    # weights only shape the fine-sample PDF). The finest level is ~61% of
    # encoder FLOPs; quality gate on the champion checkpoint in BASELINE.md.
    proposal_drop: int = 0
    # proposal-SKIP (eval-only): drop the coarse σ-only proposal pass
    # entirely and spend N_samples+N_importance stratified samples in one
    # fine pass. Motivated by measurement (BASELINE.md round 4): champion
    # CP-grid checkpoints train with a diverged coarse field (psnr_coarse
    # ≈ 4.9 — the grid-lr divergence signature), so the importance PDF is
    # effectively uniform and the proposal pass is pure FLOP waste.
    # Quality-gated per checkpoint. Also usable at TRAIN time
    # (--train_proposal_skip): one field pass per step, no coarse losses.
    proposal_skip: bool = False
    # σ -> density nonlinearity used in compositing: "relu" (reference
    # semantics, rendering.py:189-192) or "softplus" (no zero-gradient
    # dead region — the principled fix for the ReLU-death proposal basin,
    # BASELINE.md round 4). Applied to σ+noise; the σ-gradient normal uses
    # ∇σ_raw either way (softplus' derivative is a positive scalar, so the
    # normalized direction is identical).
    sigma_activation: str = "relu"

    @property
    def has_fine(self) -> bool:
        return self.fine_pass != "none" and self.N_importance > 0


def check_secondary_render(rs, rs_sec) -> None:
    """A reduced secondary-bounce budget must keep the render's key structure
    (has_fine) identical to the primary's: eval_trace reads `rgb_fine` from
    the secondary results when the primary pass is 'fine', so a secondary
    N_importance of 0 would silently drop the reflection blend (ADVICE r4).
    """
    if rs_sec is None:
        return
    if rs_sec.has_fine != rs.has_fine:
        raise ValueError(
            f"secondary render budget (N_importance={rs_sec.N_importance}, "
            f"fine_pass={rs_sec.fine_pass!r}) changes has_fine "
            f"({rs_sec.has_fine}) vs the primary ({rs.has_fine}); use "
            "secondary_N_importance >= 1 (or 0 only when the primary also "
            "renders coarse-only)")


def sigma_activation(sigmas, act: str):
    """Raw σ -> nonnegative density. "relu" is the reference semantics
    (rendering.py:189-192). "softplus" removes the zero-gradient dead
    region (the ReLU-death basin that froze the CP-grid coarse proposal,
    BASELINE.md round 4) — the instant-NGP-family activation choice."""
    if act == "softplus":
        return jax.nn.softplus(sigmas)
    return jax.nn.relu(sigmas)


def _composite_weights(sigmas, z_vals, noise, act: str = "relu"):
    """α-compositing weights from raw σ (reference rendering.py:182-199)."""
    deltas = z_vals[:, 1:] - z_vals[:, :-1]
    delta_inf = jnp.full_like(deltas[:, :1], 1e10)
    deltas = jnp.concatenate([deltas, delta_inf], axis=-1)
    alphas = 1.0 - jnp.exp(-deltas * sigma_activation(sigmas + noise, act))
    shifted = jnp.concatenate(
        [jnp.ones_like(alphas[:, :1]), 1.0 - alphas + 1e-10], axis=-1
    )
    transmittance = jnp.cumprod(shifted[:, :-1], axis=-1)
    return alphas * transmittance


def _density_with_grad(field, params, xyz_flat):
    """One batched vjp: σ, trunk features, and ∇σ w.r.t. the raw coords.

    Equivalent to the reference's per-chunk `torch.autograd.grad` normal
    (`models/mirror_nerf.py:136-146`, `utils/func.py:10-25`) but computed for
    the whole sample tensor at once; remains differentiable (grad-of-grad)
    for the normal-supervision losses.
    """
    (sigma, geo), vjp_fn = jax.vjp(lambda x: field.density(params, x), xyz_flat)
    (grad_x,) = vjp_fn((jnp.ones_like(sigma), jnp.zeros_like(geo)))
    return sigma, geo, grad_x


def _inference(
    field,
    params,
    typ: str,
    xyz: jnp.ndarray,  # (N, S, 3)
    z_vals: jnp.ndarray,  # (N, S)
    dirs: jnp.ndarray,  # (N, 3) unit view dirs
    rng: jax.Array,
    rs: RenderSettings,
    results: dict,
    sigma_only: bool,
    mirror_mask_per_ray,  # (N,) float GT mask (may carry -1 sentinel) or None
    gt_mask_valid,  # traced scalar bool or None
    ray_o=None,  # (N, 3) ray origins (fused ray-mode fast path)
    ray_d=None,  # (N, 3) ray directions
):
    N, S = z_vals.shape
    xyz_flat = xyz.reshape(-1, 3)

    if (rs.fused_field and not rs.compute_normal
            and getattr(field, "supports_fused_cp", False)
            and ray_o is not None):
        return _inference_fused_cp(
            field, params, typ, z_vals, dirs, rng, rs, results, sigma_only,
            ray_o, ray_d)
    if (rs.fused_field and not rs.compute_normal
            and getattr(field, "supports_fused", False)):
        if rs.fused_t and ray_o is not None and rs.noise_std == 0:
            return _inference_fused_t(
                field, params, typ, z_vals, dirs, rs, results, sigma_only,
                ray_o, ray_d)
        return _inference_fused(
            field, params, typ, xyz, z_vals, dirs, rng, rs, results,
            sigma_only, ray_o, ray_d)

    if rs.compute_normal:
        f_grad = field
        force_fp32_grad = (
            rs.fp32_sigma_grad
            and getattr(field, "compute_dtype", "float32") == "bfloat16")
        if force_fp32_grad and not (
                rs.fused_density
                and getattr(field, "supports_fused_train", False)):
            # XLA fallback: rebuild the density graph in fp32. The FUSED
            # kernel needs no such downgrade (VERDICT r3 #3): it already
            # carries what fp32_sigma_grad buys on this hardware — fp32
            # coords/bases in VMEM, fp32 elementwise products, fp32
            # accumulators — and its bf16 matmul OPERANDS match what the
            # MXU does to the "fp32" XLA path anyway (default-precision
            # operand truncation, docs/kernels.md). So bf16 compute_dtype
            # + fp32_sigma_grad keeps the fused rate instead of dropping
            # to the unfused fp32 path.
            import dataclasses

            f_grad = dataclasses.replace(field, compute_dtype="float32")
        if (rs.fused_density
                and getattr(f_grad, "supports_fused_train", False)):
            from ..ops.pallas.fused_cp_train import density_with_grad_fused

            sigma_flat, geo_flat, grad_flat = density_with_grad_fused(
                f_grad, params, xyz_flat)
        else:
            sigma_flat, geo_flat, grad_flat = _density_with_grad(
                f_grad, params, xyz_flat)
        normals = l2_normalize(-grad_flat).reshape(N, S, 3)
    else:
        if rs.fused_density and getattr(field, "supports_fused_train", False):
            from ..ops.pallas.fused_cp_train import density_fused

            sigma_flat, geo_flat = density_fused(field, params, xyz_flat)
        else:
            sigma_flat, geo_flat = field.density(params, xyz_flat)
        normals = None

    sigmas = sigma_flat.reshape(N, S)

    pred_normals = None
    if field.predict_normal:
        geo_for_normal = (
            jax.lax.stop_gradient(geo_flat)
            if rs.detach_density_for_normal_loss
            else geo_flat
        )
        pred_normals = l2_normalize(field.normal_head(params, geo_for_normal))
        pred_normals = pred_normals.reshape(N, S, 3)

    rgbs = None
    is_mirrors = None
    if not sigma_only:
        dirs_flat = jnp.repeat(dirs, S, axis=0)  # (N*S, 3) — per-sample viewdir
        rgbs = field.color(params, geo_flat, dirs_flat).reshape(N, S, 3)

        if field.predict_mirror_mask:
            if rs.detach_density_for_mask_loss:
                geo_for_mirror = jax.lax.stop_gradient(geo_flat)
            elif (
                rs.detach_density_outside_mirror_for_mask_loss
                and mirror_mask_per_ray is not None
            ):
                # Detach the trunk features of samples outside the GT mirror —
                # but only when the GT mask is valid (traced predicate); the
                # values are identical either way, only gradients are gated.
                m = (mirror_mask_per_ray > 0.5)[:, None]  # (N, 1) -> bcast (N, S)
                m = jnp.broadcast_to(m, (N, S)).reshape(-1)[:, None]
                keep_grad = jnp.logical_or(m, jnp.logical_not(gt_mask_valid))
                geo_for_mirror = jnp.where(
                    keep_grad, geo_flat, jax.lax.stop_gradient(geo_flat)
                )
            else:
                geo_for_mirror = geo_flat
            is_mirrors = field.mirror_head(params, geo_for_mirror).reshape(N, S)

    noise = (jax.random.normal(rng, sigmas.shape, sigmas.dtype) * rs.noise_std
             if rs.noise_std > 0 else jnp.zeros_like(sigmas))
    weights = _composite_weights(sigmas, z_vals, noise, rs.sigma_activation)
    weights_sum = jnp.sum(weights, axis=-1)

    results[f"weights_{typ}"] = weights
    results[f"opacity_{typ}"] = weights_sum
    results[f"z_vals_{typ}"] = z_vals
    if sigma_only:
        return results

    rgb_map = jnp.sum(weights[..., None] * rgbs, axis=1)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    if rs.white_back:
        rgb_map = rgb_map + (1.0 - weights_sum[:, None])
    results[f"rgb_{typ}"] = rgb_map
    results[f"depth_{typ}"] = depth_map

    if is_mirrors is not None:
        if rs.detach_density_for_mask_loss:
            w_for_mask = jax.lax.stop_gradient(weights)
        elif (
            rs.detach_density_outside_mirror_for_mask_loss
            and mirror_mask_per_ray is not None
        ):
            m = (mirror_mask_per_ray > 0.5)[:, None]
            keep_grad = jnp.logical_or(m, jnp.logical_not(gt_mask_valid))
            w_for_mask = jnp.where(keep_grad, weights,
                                   jax.lax.stop_gradient(weights))
        else:
            w_for_mask = weights
        results[f"mirror_mask_{typ}"] = jnp.sum(w_for_mask * is_mirrors, axis=-1)

    w_for_normal = (
        jax.lax.stop_gradient(weights)
        if rs.detach_density_for_normal_loss
        else weights
    )
    if normals is not None:
        results[f"normal_{typ}"] = normals
        results[f"surface_normal_grad_{typ}"] = jnp.sum(
            normals * w_for_normal[..., None], axis=1
        )
    if pred_normals is not None:
        results[f"pred_normal_{typ}"] = pred_normals
        results[f"surface_normal_{typ}"] = jnp.sum(
            pred_normals * w_for_normal[..., None], axis=1
        )
    if normals is not None and pred_normals is not None:
        normal_dif = jnp.sum((normals - pred_normals) ** 2, axis=-1)
        results[f"normal_dif_{typ}"] = jnp.sum(w_for_normal * normal_dif, axis=-1)
    return results




def _inference_fused_t(field, params, typ, z_vals, dirs, rs, results,
                       sigma_only, ray_o, ray_d):
    """Eval-path inference for the PE-MLP flagship through the transposed
    kernel with IN-KERNEL compositing (ops/pallas/fused_mlp_t.py): the
    per-sample rows tensor never exists; the kernel returns per-sample
    weights plus per-ray composited opacity/rgb/normal/mirror/depth.
    Forward-only; eval semantics (noise_std == 0)."""
    from ..ops.pallas.fused_mlp_t import fused_t_rays_eval

    res = fused_t_rays_eval(field, params, ray_o, ray_d, dirs, z_vals,
                            sigma_only=sigma_only,
                            sigma_act=rs.sigma_activation)
    weights = res["weights"]
    results[f"weights_{typ}"] = weights
    results[f"z_vals_{typ}"] = z_vals
    if sigma_only:
        results[f"opacity_{typ}"] = jnp.sum(weights, axis=-1)
        return results
    results[f"opacity_{typ}"] = res["opacity"]
    rgb_map = res["rgb"]
    if rs.white_back:
        rgb_map = rgb_map + (1.0 - res["opacity"][:, None])
    results[f"rgb_{typ}"] = rgb_map
    results[f"depth_{typ}"] = res["depth"]
    if field.predict_mirror_mask:
        results[f"mirror_mask_{typ}"] = res["mirror"]
    if field.predict_normal:
        results[f"surface_normal_{typ}"] = res["normal"]
    return results


def _inference_fused_cp(field, params, typ, z_vals, dirs, rng, rs, results,
                        sigma_only, ray_o, ray_d):
    """Eval-path inference for the CP-grid speed field (TPUGridField)
    through the fully-fused transposed kernel (ops/pallas/fused_cp.py):
    encoder + all nets + epilogue in one pallas_call, 8 floats of output
    per sample. Forward-only; gated by the caller on
    rs.compute_normal == False and no compaction masks."""
    from ..ops.pallas.fused_cp import (fused_cp_rays_composite,
                                       fused_cp_rays_eval)

    drop = rs.proposal_drop if sigma_only else 0
    if rs.noise_std == 0:
        # composite mode: weights + the per-ray render computed in-kernel
        res = fused_cp_rays_composite(field, params, ray_o, ray_d, dirs,
                                      z_vals, sigma_only=sigma_only,
                                      drop_levels=drop,
                                      sigma_act=rs.sigma_activation)
        weights = res["weights"]
        results[f"weights_{typ}"] = weights
        results[f"z_vals_{typ}"] = z_vals
        if sigma_only:
            results[f"opacity_{typ}"] = jnp.sum(weights, axis=-1)
            return results
        results[f"opacity_{typ}"] = res["opacity"]
        rgb_map = res["rgb"]
        if rs.white_back:
            rgb_map = rgb_map + (1.0 - res["opacity"][:, None])
        results[f"rgb_{typ}"] = rgb_map
        results[f"depth_{typ}"] = res["depth"]
        if field.predict_mirror_mask:
            results[f"mirror_mask_{typ}"] = res["mirror"]
        if field.predict_normal:
            results[f"surface_normal_{typ}"] = res["normal"]
        return results

    res = fused_cp_rays_eval(field, params, ray_o, ray_d, dirs, z_vals,
                             sigma_only=sigma_only, drop_levels=drop)
    sigmas = res["sigma"]
    noise = (jax.random.normal(rng, sigmas.shape, sigmas.dtype) * rs.noise_std
             if rs.noise_std > 0 else jnp.zeros_like(sigmas))
    weights = _composite_weights(sigmas, z_vals, noise, rs.sigma_activation)
    weights_sum = jnp.sum(weights, axis=-1)
    results[f"weights_{typ}"] = weights
    results[f"opacity_{typ}"] = weights_sum
    results[f"z_vals_{typ}"] = z_vals
    if sigma_only:
        return results

    rgb_map = jnp.einsum("ns,cns->nc", weights, res["rgb3"])
    if rs.white_back:
        rgb_map = rgb_map + (1.0 - weights_sum[:, None])
    results[f"rgb_{typ}"] = rgb_map
    results[f"depth_{typ}"] = jnp.sum(weights * z_vals, axis=-1)
    if field.predict_mirror_mask:
        results[f"mirror_mask_{typ}"] = jnp.sum(weights * res["mirror"], -1)
    if field.predict_normal:
        results[f"surface_normal_{typ}"] = jnp.einsum(
            "ns,cns->nc", weights, res["normal3"])
    return results


def _inference_fused(field, params, typ, xyz, z_vals, dirs, rng, rs,
                     results, sigma_only, ray_o=None, ray_d=None):
    """Eval-path inference through the fully-fused Pallas field kernel.

    The kernel emits one FINAL packed bf16 row per sample (lane 0 raw σ,
    1:4 rgb, 4:7 unit pred-normal, 7 mirror prob — nonlinearities already
    applied in-kernel), and compositing happens directly on the packed rows:
    per-ray values are extracted only after the sample-axis reduction, so no
    narrow columns are ever sliced out of the wide per-sample array (each
    such slice re-reads whole 128-lane tiles from HBM).

    Forward-only; gated by the caller on rs.compute_normal == False.
    """
    from ..ops.pallas.fused_mlp import fused_packed_eval

    N, S = z_vals.shape
    xyz_flat = xyz.reshape(-1, 3)

    if ray_o is not None:
        # ray mode: xyz and both encodings are built inside the kernel
        # from per-ray o/d/viewdir + per-ray depths — no per-sample
        # tensor crosses HBM on the input side. `xyz` is never consumed
        # here, so XLA drops its construction entirely.
        from ..ops.pallas.fused_mlp import fused_rays_eval

        rows = fused_rays_eval(field, params, ray_o, ray_d, dirs,
                               z_vals, sigma_only=sigma_only)
    elif sigma_only:
        rows = fused_packed_eval(field, params, xyz_flat, sigma_only=True)
    else:
        dirs_flat = jnp.repeat(dirs, S, axis=0)
        rows = fused_packed_eval(field, params, xyz_flat, dirs_flat)

    sigmas = rows[:, 0].astype(jnp.float32).reshape(N, S)
    noise = (jax.random.normal(rng, sigmas.shape, sigmas.dtype) * rs.noise_std
             if rs.noise_std > 0 else jnp.zeros_like(sigmas))
    weights = _composite_weights(sigmas, z_vals, noise, rs.sigma_activation)
    weights_sum = jnp.sum(weights, axis=-1)
    results[f"weights_{typ}"] = weights
    results[f"opacity_{typ}"] = weights_sum
    results[f"z_vals_{typ}"] = z_vals
    if sigma_only:
        return results

    # one fused multiply-reduce over the sample axis on the packed rows
    pmap = jnp.sum(weights[..., None] * rows.reshape(N, S, -1), axis=1)
    rgb_map = pmap[:, 1:4]
    if rs.white_back:
        rgb_map = rgb_map + (1.0 - weights_sum[:, None])
    results[f"rgb_{typ}"] = rgb_map
    results[f"depth_{typ}"] = jnp.sum(weights * z_vals, axis=-1)
    if field.predict_mirror_mask:
        results[f"mirror_mask_{typ}"] = pmap[:, 7]
    if field.predict_normal:
        results[f"surface_normal_{typ}"] = pmap[:, 4:7]
    return results


def render_rays(
    field,
    params: dict,  # {"coarse": pytree, "fine": pytree (optional)}
    rays: jnp.ndarray,  # (N, 8) = [o, d, near, far]
    rng: jax.Array,
    rs: RenderSettings,
    mirror_mask_gt=None,  # (N,) float GT mask with -1 sentinel, or None
    view_dirs=None,  # optional override for the color-head view direction
) -> dict:
    """Render a ray batch through the coarse(+fine) fields. Returns the same
    result keys as the reference renderer, suffixed _coarse/_fine."""
    rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
    near, far = rays[:, 6:7], rays[:, 7:8]
    dirs = rays_d if view_dirs is None else view_dirs

    gt_mask_valid = None
    if mirror_mask_gt is not None:
        gt_mask_valid = jnp.all(mirror_mask_gt >= 0)

    k_perturb, k_noise_c, k_pdf, k_noise_f = jax.random.split(rng, 4)

    if rs.proposal_skip and rs.has_fine:
        # proposal-skip: no coarse pass; one fine pass on
        # N_samples+N_importance stratified samples (see RenderSettings).
        # Engages only when the caller sets it: eval via --proposal_skip,
        # training via --train_proposal_skip (the TPU-first single-pass
        # mode — losses skip their coarse terms by key absence).
        z_all = stratified_z_vals(
            k_perturb, near, far, rs.N_samples + rs.N_importance,
            rs.use_disp, rs.perturb)
        xyz_all = rays_o[:, None, :] + rays_d[:, None, :] * z_all[..., None]
        results = {}
        typ = "coarse" if rs.fine_pass == "coarse" else "fine"
        p_fine = params["coarse" if rs.fine_pass == "coarse" else "fine"]
        _inference(
            field, p_fine, typ, xyz_all, z_all, dirs, k_noise_f, rs,
            results, False, mirror_mask_gt, gt_mask_valid,
            ray_o=rays_o, ray_d=rays_d,
        )
        if f"depth_{typ}" in results:
            results[f"x_surface_{typ}"] = (
                rays_o + rays_d * results[f"depth_{typ}"][:, None])
        return results

    z_vals = stratified_z_vals(
        k_perturb, near, far, rs.N_samples, rs.use_disp, rs.perturb
    )
    xyz_coarse = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]

    results: dict = {}
    has_fine_model = rs.has_fine
    coarse_sigma_only = rs.test_time and has_fine_model
    _inference(
        field, params["coarse"], "coarse", xyz_coarse, z_vals, dirs,
        k_noise_c, rs, results, coarse_sigma_only, mirror_mask_gt,
        gt_mask_valid, ray_o=rays_o, ray_d=rays_d,
    )

    if rs.has_fine:
        z_fine = merge_fine_z_vals(
            k_pdf, z_vals, results["weights_coarse"], rs.N_importance,
            rs.perturb,
        )
        xyz_fine = rays_o[:, None, :] + rays_d[:, None, :] * z_fine[..., None]

        if rs.fine_pass == "coarse":
            # only_one_field past warm-up: the *coarse* results are overwritten
            # by a second pass of the same field on the merged samples
            # (reference rendering.py:328-348).
            _inference(
                field, params["coarse"], "coarse", xyz_fine, z_fine, dirs,
                k_noise_f, rs, results, False, mirror_mask_gt, gt_mask_valid,
                ray_o=rays_o, ray_d=rays_d,
            )
        else:
            _inference(
                field, params["fine"], "fine", xyz_fine, z_fine, dirs,
                k_noise_f, rs, results, False, mirror_mask_gt, gt_mask_valid,
                ray_o=rays_o, ray_d=rays_d,
            )

    for typ in ("coarse", "fine"):
        if f"depth_{typ}" in results:
            results[f"x_surface_{typ}"] = (
                rays_o + rays_d * results[f"depth_{typ}"][:, None]
            )
    return results
