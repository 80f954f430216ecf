"""Training losses with the reference's staging schedule.

Capability parity with reference `losses.py`:
  * ColorLoss (:7-51) — MSE with three masking regimes during the geometry
    stage (invalid GT mask -> exclude *predicted* mirror pixels; valid GT mask
    + woMaskRGBtoBlack -> exclude GT mirror pixels; else plain, with targets
    pre-blacked inside the mirror by the step function)
  * NormalLoss (:54-77) — weighted pred-vs-gradient normal MSE, ×100 inside
    the mirror when a valid GT mask exists
  * PlaneConsistentLoss (:80-127) — |triple product| over random 4-tuples of
    mirror surface points (mirror surfaces must be planar)
  * NormalRegLoss (:131-172) — Ref-NeRF-style penalty on normals facing along
    the ray, for predicted normals (both typs) and the fine gradient normal
  * MirrorMaskLoss (:175-198) — BCE on the rendered mirror probability vs the
    GT mask, restricted to valid (>=0) pixels
  * TotalLoss (:201-255) — the per-epoch loss schedule

JAX-specific notes: the reference's data-dependent branches ("is the GT mask
valid in this batch?") become traced scalar predicates selecting between
branch values; fancy-indexed means become masked means (safe when empty);
the plane loss samples a *fixed* number of 4-tuples from the mirror pixels
with an explicit PRNG key (the reference draws `count//4` tuples with the
global torch RNG — same estimator, static shapes).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..core.mathutil import binary_cross_entropy, masked_mean


@dataclass(frozen=True)
class LossSettings:
    """Static loss configuration, resolved per stage/epoch by the caller."""

    color_loss_weight: float = 1.0
    normal_loss_weight: float = 1e-4
    normal_reg_loss_weight: float = 0.1
    mirror_mask_loss_weight: float = 0.1
    plane_consistent_loss_weight: float = 0.1
    # opt-in floater suppression; 0 = exact reference loss set
    distortion_loss_weight: float = 0.0

    train_geometry_stage: bool = False
    woMaskRGBtoBlack: bool = False
    normal_loss_only_inside_mirror: bool = False
    use_plane_consistent_loss: bool = False
    # epoch-resolved schedule switches (reference losses.py:221-248)
    enable_mask_loss: bool = True
    enable_plane_loss: bool = False
    enable_normal_losses: bool = True
    # number of 4-tuples for the plane loss (reference uses count//4 with the
    # batch's mirror pixel count; we use batch//4 fixed tuples)
    plane_n_tuples: int = 256
    # stable BCE clamp (reference clamps to [1e-7, 1-1e-7], losses.py:193)
    bce_eps: float = 1e-7


def _typs(results):
    return [t for t in ("coarse", "fine") if f"rgb_{t}" in results]


def color_loss(ls: LossSettings, results: dict, batch: dict) -> jnp.ndarray:
    targets = batch["rgbs"].reshape(-1, 3)
    gt_mask = batch.get("mirror_mask")
    loss = 0.0
    if ls.train_geometry_stage and gt_mask is not None:
        gt_invalid = jnp.any(gt_mask < 0)
        # branch A: invalid GT mask -> exclude predicted mirror pixels
        pred_key = ("mirror_mask_fine" if "mirror_mask_fine" in results
                    else "mirror_mask_coarse" if "mirror_mask_coarse" in results
                    else None)
        for typ in _typs(results):
            se = (results[f"rgb_{typ}"] - targets) ** 2  # (N, 3)
            if pred_key is not None:
                pm = jax.lax.stop_gradient(results[pred_key]) > 0.5
                loss_invalid = masked_mean(se, ~pm[:, None])
            else:
                loss_invalid = jnp.asarray(0.0)
            if ls.woMaskRGBtoBlack:
                gm = gt_mask > 0.5
                loss_valid = masked_mean(se, ~gm[:, None])
            else:
                # targets were pre-blacked inside the mirror by the step fn
                loss_valid = jnp.mean(se)
            loss = loss + jnp.where(gt_invalid, loss_invalid, loss_valid)
    else:
        for typ in _typs(results):
            loss = loss + jnp.mean((results[f"rgb_{typ}"] - targets) ** 2)
    return ls.color_loss_weight * loss


def normal_loss(ls: LossSettings, results: dict, batch: dict) -> jnp.ndarray:
    gt_mask = batch.get("mirror_mask")
    loss = 0.0
    any_term = False
    for typ in ("coarse", "fine"):
        key = f"normal_dif_{typ}"
        if key not in results:
            continue
        any_term = True
        dif = results[key]  # (N,)
        plain = jnp.mean(dif)
        if gt_mask is not None:
            m = gt_mask > 0.5
            inside = masked_mean(dif, m) * 100.0
            outside = masked_mean(dif, ~m)
            masked = inside if ls.normal_loss_only_inside_mirror else (
                inside + outside)
            valid = jnp.all(gt_mask >= 0)
            loss = loss + jnp.where(valid, masked, plain)
        else:
            loss = loss + plain
    if not any_term:
        return None
    return ls.normal_loss_weight * loss


def plane_consistent_loss(
    ls: LossSettings, results: dict, batch: dict, rng: jax.Array
) -> jnp.ndarray:
    """|((p1-p0)×(p2-p0))·(p3-p0)| over random mirror-pixel 4-tuples."""
    gt_mask = batch.get("mirror_mask")
    if gt_mask is None:
        return None
    valid = jnp.all(gt_mask >= 0)
    inside = gt_mask > 0.5
    count = jnp.sum(inside)
    # categorical over mirror pixels (uniform); -inf logits outside.
    logits = jnp.where(inside, 0.0, -jnp.inf)
    # guard: if no mirror pixels at all, sample uniformly and zero the loss.
    safe_logits = jnp.where(count > 0, logits, jnp.zeros_like(logits))
    idx = jax.random.categorical(
        rng, safe_logits, shape=(ls.plane_n_tuples, 4)
    )
    loss = 0.0
    any_term = False
    for typ in ("fine", "coarse"):
        key = f"x_surface_{typ}"
        if key not in results:
            continue
        any_term = True
        pts = results[key][idx]  # (T, 4, 3)
        v1 = pts[:, 1] - pts[:, 0]
        v2 = pts[:, 2] - pts[:, 0]
        v3 = pts[:, 3] - pts[:, 0]
        triple = jnp.sum(jnp.cross(v1, v2) * v3, axis=-1)
        term = jnp.mean(jnp.abs(triple))
        # active only with a valid GT mask and >=4 mirror pixels
        # (reference: times = N_in_mask // 4 > 0)
        term = jnp.where(valid & (count >= 4), term, 0.0)
        loss = loss + term
    if not any_term:
        return None
    return ls.plane_consistent_loss_weight * loss


def distortion_loss(ls: LossSettings, results: dict) -> jnp.ndarray:
    """Interval distortion prior on the fine weights (mip-NeRF 360, eq. 15).

    Penalizes ray weight that is spread out along the ray, which is exactly
    the failure mode of semi-transparent "fog floaters" parked between
    train-ray corridors. NOT in the reference — opt-in via
    --distortion_loss_weight (default 0 keeps exact reference behavior).

    Computed in O(N) per ray with exclusive prefix sums over the sorted
    sample positions instead of the N² pairwise matrix:
        sum_ij w_i w_j |s_i - s_j| = 2 * sum_i w_i (s_i W_i - S_i)
    where W_i = sum_{j<i} w_j and S_i = sum_{j<i} w_j s_j.
    """
    w = results.get("weights_fine")
    z = results.get("z_vals_fine")
    if w is None or z is None:
        w = results.get("weights_coarse")
        z = results.get("z_vals_coarse")
    if w is None or z is None:
        return None
    return ls.distortion_loss_weight * distortion_core(w, z)


def distortion_core(w: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """Mean per-ray interval distortion of weights (N, S) over depths (N, S),
    O(S) via exclusive prefix sums (see distortion_loss)."""
    z0, z1 = z[:, :1], z[:, -1:]
    # scale-free ray coordinate in [0, 1] (z_vals are sorted)
    s = (z - z0) / jnp.maximum(z1 - z0, 1e-8)
    w = w.astype(jnp.float32)
    s = s.astype(jnp.float32)
    w_cum = jnp.cumsum(w, axis=-1) - w  # exclusive
    ws_cum = jnp.cumsum(w * s, axis=-1) - w * s
    bi = 2.0 * jnp.sum(w * (s * w_cum - ws_cum), axis=-1)
    delta = jnp.diff(s, axis=-1, append=s[:, -1:])
    intra = jnp.sum(w * w * delta, axis=-1) / 3.0
    return jnp.mean(bi + intra)


def novel_ray_regularization(field, params: dict, rays: jnp.ndarray,
                             key, N_samples: int, jitter: float,
                             fused: bool = False, sigma_act: str = "relu"):
    """Distortion prior along rays cast from JITTERED origins (no color
    target). Train-ray losses are blind to density in space no train ray
    traverses (the fog-floater failure mode, STATUS.md item 7); shifting the
    origins laterally by up to ~3σ·jitter sweeps the corridors between train
    cameras. Coarse stratified σ-only render, differentiable into the field.
    Not in the reference — opt-in via --novel_ray_batch."""
    from ..core.sampling import stratified_z_vals
    from ..render.renderer import _composite_weights

    k_o, k_z = jax.random.split(key)
    o = rays[:, 0:3] + jitter * jax.random.normal(k_o, rays[:, 0:3].shape)
    d = rays[:, 3:6]
    near, far = rays[:, 6:7], rays[:, 7:8]
    z = stratified_z_vals(k_z, near, far, N_samples, False, 1.0)
    xyz = o[:, None, :] + d[:, None, :] * z[..., None]
    fine = params.get("fine", params["coarse"])
    if fused and getattr(field, "supports_fused_train", False):
        from ..ops.pallas.fused_cp_train import density_fused

        # the jittered origins carry no gradient -> skip d_x (slope pass)
        sigma, _ = density_fused(field, fine, xyz.reshape(-1, 3),
                                 need_dx=False)
    else:
        sigma, _ = field.density(fine, xyz.reshape(-1, 3))
    w = _composite_weights(sigma.reshape(z.shape), z,
                           jnp.zeros_like(z), sigma_act)
    return distortion_core(w, z)


def normal_reg_loss(ls: LossSettings, results: dict, batch: dict) -> jnp.ndarray:
    rays_d = batch["rays"][..., 3:6].reshape(-1, 3)
    valid = batch.get("valid_mask")
    loss = 0.0
    any_term = False

    def _term(normals, weights):
        # (N, S, 3) normals, (N, S) weights
        pen = jnp.sum(jax.nn.relu(normals * rays_d[:, None, :]), axis=-1)
        per_elem = pen * weights  # (N, S)
        if valid is not None:
            return masked_mean(per_elem, valid.reshape(-1, 1))
        return jnp.mean(per_elem)

    for typ in ("coarse", "fine"):
        if f"pred_normal_{typ}" in results:
            any_term = True
            loss = loss + _term(results[f"pred_normal_{typ}"],
                                results[f"weights_{typ}"])
    # ext_supervise_grad_normal=True default: also the fine gradient normal
    if "normal_fine" in results:
        any_term = True
        loss = loss + _term(results["normal_fine"], results["weights_fine"])
    if not any_term:
        return None
    return ls.normal_reg_loss_weight * loss


def mirror_mask_loss(ls: LossSettings, results: dict, batch: dict) -> jnp.ndarray:
    gt_mask = batch.get("mirror_mask")
    if gt_mask is None:
        return None
    loss = 0.0
    any_term = False
    for typ in ("coarse", "fine"):
        key = f"mirror_mask_{typ}"
        if key not in results:
            continue
        any_term = True
        pred = jnp.clip(results[key], ls.bce_eps, 1.0 - ls.bce_eps)
        bce = binary_cross_entropy(pred, gt_mask)
        valid = (gt_mask >= 0).astype(bce.dtype)
        # mean over ALL rays with invalid entries zeroed (reference :197)
        loss = loss + jnp.mean(bce * jax.lax.stop_gradient(valid))
    if not any_term:
        return None
    return ls.mirror_mask_loss_weight * loss


def total_loss(
    ls: LossSettings, results: dict, batch: dict, rng: jax.Array
):
    """Scheduled sum of all losses. Returns (loss_sum, dict of components)."""
    loss_dict = {}
    loss_dict["color_loss"] = color_loss(ls, results, batch)

    if ls.enable_mask_loss:
        v = mirror_mask_loss(ls, results, batch)
        if v is not None:
            loss_dict["mirror_mask_loss"] = v

    if ls.enable_plane_loss and ls.use_plane_consistent_loss:
        v = plane_consistent_loss(ls, results, batch, rng)
        if v is not None:
            loss_dict["plane_consistent_loss"] = v

    if ls.distortion_loss_weight > 0:
        v = distortion_loss(ls, results)
        if v is not None:
            loss_dict["distortion_loss"] = v

    if ls.enable_normal_losses:
        v = normal_loss(ls, results, batch)
        if v is not None:
            loss_dict["normal_loss"] = v
        v = normal_reg_loss(ls, results, batch)
        if v is not None:
            loss_dict["normal_reg_loss"] = v

    loss_sum = sum(loss_dict.values())
    return loss_sum, loss_dict


def make_loss_settings(cfg, train_geometry_stage: bool, epoch: int) -> LossSettings:
    """Resolve the per-epoch schedule (reference losses.py:221-248)."""
    return LossSettings(
        color_loss_weight=cfg.color_loss_weight,
        normal_loss_weight=cfg.normal_loss_weight,
        normal_reg_loss_weight=cfg.normal_reg_loss_weight,
        mirror_mask_loss_weight=cfg.mirror_mask_loss_weight,
        plane_consistent_loss_weight=cfg.plane_consistent_loss_weight,
        distortion_loss_weight=cfg.distortion_loss_weight,
        train_geometry_stage=train_geometry_stage,
        woMaskRGBtoBlack=cfg.woMaskRGBtoBlack,
        normal_loss_only_inside_mirror=cfg.normal_loss_only_inside_mirror,
        use_plane_consistent_loss=cfg.use_plane_consistent_loss,
        enable_mask_loss=(not train_geometry_stage)
        or epoch >= cfg.train_mirror_mask_start_epoch,
        enable_plane_loss=epoch >= cfg.smooth_mirror_start_epoch,
        enable_normal_losses=(not train_geometry_stage)
        or epoch >= cfg.train_normal_start_epoch,
        plane_n_tuples=max(cfg.batch_size // 4, 1),
    )
