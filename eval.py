#!/usr/bin/env python
"""Evaluation / application driver (reference-compatible CLI).

Capability parity with reference `eval.py`: novel-view synthesis over a test
split with Whitted-traced reflections, per-view PNG trees
(rgb / depth / mirror_mask / normal / depth_reflect / x_surface), GIFs, mean
PSNR, a second globally-normalized depth pass — plus the four applications
(place-new-mirror, mirror roughness, reflection substitution, reflect newly
placed objects) selected by the same flags.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def get_opt(argv=None):
    from mirror_nerf_tpu.config import add_common_args, config_from_namespace

    parser = argparse.ArgumentParser()
    add_common_args(parser)
    parser.add_argument("--split", type=str, default="test")
    parser.add_argument("--only_eval_idx", type=int, default=-1)
    parser.add_argument("--not_save_depth", default=False, action="store_true")
    parser.add_argument("--depth_format", type=str, nargs="+", default=["png"])
    parser.add_argument("--render_coarse_rgb", default=False, action="store_true")
    # fully-fused Pallas field kernels on the eval path (bf16 MXU; exact up
    # to bf16 rounding). Supported for model_type nerf and nerf_tpu.
    parser.add_argument("--fused_field", default=False, action="store_true")
    # proposal-lite: truncate this many of the finest CP levels in σ-only
    # proposal (coarse) passes — eval-time perf knob for the nerf_tpu fused
    # path only (the proposal just shapes the fine-sample PDF; quality gate
    # on the champion ckpt in BASELINE.md). Requires --fused_field.
    parser.add_argument("--proposal_drop_levels", type=int, default=0)
    # proposal-SKIP: drop the coarse σ-only proposal pass entirely and
    # spend N_samples+N_importance stratified samples in one fine pass.
    # Measured rationale (BASELINE.md round 4): champion CP-grid ckpts
    # train with a diverged coarse field (psnr_coarse ≈ 4.9), so the
    # importance PDF is effectively uniform and the proposal pass is pure
    # FLOP waste. Quality-gate per checkpoint before relying on it.
    parser.add_argument("--proposal_skip", default=False,
                        action="store_true")
    # Reduced sample budget for secondary (bounce level >= 1) renders.
    # Static-shape TPU knob: each recursion level is its own compiled
    # program, so deeper bounces can legally run fewer samples (the
    # reference renders every level at the full N_samples+N_importance).
    # -1 = inherit the primary budget. Quality-gate per checkpoint
    # (tools/gate_samples.py) before relying on a reduction.
    parser.add_argument("--secondary_N_samples", type=int, default=-1)
    parser.add_argument("--secondary_N_importance", type=int, default=-1)
    # chunks rendered per dispatch (lax.map); 0 = auto (4 on TPU, 1 on CPU).
    # Amortizes per-dispatch tunnel latency — measured 2.2x wall throughput
    # on the tunneled v5e attachment (BASELINE.md).
    parser.add_argument("--megabatch", type=int, default=0)
    # applications
    parser.add_argument("--app_control_mirror_roughness", default=False,
                        action="store_true")
    parser.add_argument("--trace_ray_times", type=int, default=4)
    parser.add_argument("--normal_noise_std", type=float, default=0.01)
    parser.add_argument("--normal_noise_std_changes", default=False,
                        action="store_true")
    parser.add_argument("--app_reflection_substitution", default=False,
                        action="store_true")
    parser.add_argument("--substitution_ckpt_path", type=str, default=None)
    parser.add_argument("--app_place_new_mirror", default=False,
                        action="store_true")
    parser.add_argument("--plane_pos", type=str, default="plane_x",
                        choices=["plane_x", "plane_y"])
    parser.add_argument("--app_reflect_newly_placed_objects", default=False,
                        action="store_true")
    parser.add_argument("--obj_ckpt_path", type=str, default=None)
    parser.add_argument("--obj_model_type", type=str, default="d_nerf",
                        choices=["nerf_pl", "d_nerf"])
    ns = parser.parse_args(argv)
    return config_from_namespace(ns), ns


from mirror_nerf_tpu.train.checkpoints import load_params_any  # noqa: E402


def main(argv=None):
    cfg, args = get_opt(argv)

    from mirror_nerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from mirror_nerf_tpu.data import get_dataset
    from mirror_nerf_tpu.data.depth_utils import save_pfm
    from mirror_nerf_tpu.eval.metrics import lpips as lpips_metric
    from mirror_nerf_tpu.eval.metrics import psnr as psnr_metric
    from mirror_nerf_tpu.eval.metrics import ssim as ssim_metric
    from mirror_nerf_tpu.models.fields import make_field
    from mirror_nerf_tpu.eval.apps import AppContext, run_view
    from mirror_nerf_tpu.utils.visualization import visualize_depth

    import imageio.v2 as imageio

    w, h = cfg.img_wh
    ds_cls = get_dataset(cfg.dataset_name)
    dataset = ds_cls(cfg.root_dir, args.split, cfg.img_wh, cfg)

    field = make_field(cfg)
    params_like = {"coarse": field.init(jax.random.PRNGKey(0))}
    if cfg.N_importance > 0 and not cfg.only_one_field:
        params_like["fine"] = field.init(jax.random.PRNGKey(1))
    params = load_params_any(cfg.ckpt_path, params_like, field=field) \
        if cfg.ckpt_path else params_like

    ctx = AppContext.build(cfg, args, field, params)

    dir_name = f"results/{cfg.dataset_name}/{cfg.exp_name}"
    os.makedirs(dir_name, exist_ok=True)
    sub = {}
    for name in ("depth", "depth_unified_normalization", "mirror_mask",
                 "normal", "depth_reflect",
                 "depth_reflect_unified_normalization", "x_surface"):
        sub[name] = os.path.join(dir_name, name)
        os.makedirs(sub[name], exist_ok=True)
    print(f"[info] Results saved to dir {dir_name}.")

    n_views = len(dataset)
    imgs, masks_u8, depth_maps, depth_reflect_maps, masks_float, psnrs = (
        [], [], [], [], [], [])
    ssims, lpipss = [], []

    typ_final = "coarse"
    view_secs = []  # wall seconds per view (first view carries compiles)
    for i in range(n_views):
        if args.only_eval_idx >= 0 and i != args.only_eval_idx:
            continue
        sample = dataset.get_image(i)
        progress = i / max(n_views, 1)

        t0 = time.perf_counter()
        results = run_view(ctx, sample, progress, jax.random.PRNGKey(i))
        jax.block_until_ready(results)
        view_secs.append(time.perf_counter() - t0)
        if "compact_dropped" in results:
            n_drop = float(np.sum(results["compact_dropped"]))
            if n_drop > 0:
                print(f"[warn] view {i}: {n_drop:.0f} mirror rays exceeded "
                      f"the secondary-ray compaction capacity and render "
                      f"without reflections — raise --compact_frac")
        typ = "fine" if "rgb_fine" in results else "coarse"
        typ_final = typ

        for t in ([typ, "coarse"] if (args.render_coarse_rgb and
                                      typ != "coarse") else [typ]):
            if f"rgb_{t}" not in results:
                continue
            img = np.clip(results[f"rgb_{t}"].reshape(h, w, 3), 0, 1)
            img_u8 = (img * 255).astype(np.uint8)
            imageio.imwrite(os.path.join(dir_name, f"rgb_{t}_{i:03d}.png"),
                            img_u8)
            if t == typ:
                imgs.append(img_u8)
                if "rgbs" in sample:
                    gt_img = sample["rgbs"].reshape(h, w, 3)
                    psnrs.append(psnr_metric(gt_img, img))
                    ssims.append(ssim_metric(img, gt_img))
                    lp = lpips_metric(img, gt_img)  # NaN without weights
                    if np.isfinite(lp):
                        lpipss.append(lp)
            if not args.not_save_depth and f"depth_{t}" in results:
                dep = results[f"depth_{t}"].reshape(h, w)
                if t == typ:
                    depth_maps.append(dep)
                if "pfm" in args.depth_format:
                    save_pfm(os.path.join(sub["depth"],
                                          f"depth_{t}_{i:03d}.pfm"), dep)
                if "png" in args.depth_format:
                    imageio.imwrite(
                        os.path.join(sub["depth"], f"depth_{t}_{i:03d}.png"),
                        (visualize_depth(dep) * 255).astype(np.uint8))
                if "bytes" in args.depth_format:
                    with open(os.path.join(sub["depth"],
                                           f"depth_{t}_{i:03d}"), "wb") as f:
                        f.write(dep.tobytes())
            if f"mirror_mask_{t}" in results:
                mm = np.clip(results[f"mirror_mask_{t}"].reshape(h, w), 0, 1)
                mm3 = np.repeat(mm[..., None], 3, -1)
                if t == typ:
                    masks_float.append(mm3)
                    masks_u8.append((mm3 * 255).astype(np.uint8))
                imageio.imwrite(
                    os.path.join(sub["mirror_mask"],
                                 f"mirror_mask_{t}_{i:03d}.png"),
                    (mm3 * 255).astype(np.uint8))
                if f"depth_{t}_reflect" in results:
                    dr = results[f"depth_{t}_reflect"].reshape(h, w)
                    if t == typ:
                        depth_reflect_maps.append(dr)
                    canvas = visualize_depth(dr) * mm3
                    imageio.imwrite(
                        os.path.join(sub["depth_reflect"],
                                     f"depth_reflect_{t}_{i:03d}.png"),
                        (canvas * 255).astype(np.uint8))
            for key, name in ((f"surface_normal_grad_{t}",
                               f"surface_normal_grad_{t}"),
                              (f"surface_normal_{t}", f"surface_normal_{t}")):
                if key in results:
                    nrm = np.clip((results[key].reshape(h, w, 3) + 1) / 2, 0, 1)
                    imageio.imwrite(
                        os.path.join(sub["normal"], f"{name}_{i:03d}.png"),
                        (nrm * 255).astype(np.uint8))
            if f"x_surface_{t}" in results:
                xs = results[f"x_surface_{t}"].reshape(h, w, 3)
                xs = (xs - xs.min()) / (xs.max() - xs.min() + 1e-8)
                imageio.imwrite(
                    os.path.join(sub["x_surface"], f"x_surface_{t}_{i:03d}.png"),
                    (np.clip(xs, 0, 1) * 255).astype(np.uint8))
        print(f"[{i + 1}/{n_views}] rendered"
              + (f", psnr={psnrs[-1]:.2f}" if psnrs else ""))

    if imgs:
        imageio.mimsave(
            os.path.join(dir_name, f"{cfg.exp_name}_rgb_{typ_final}.gif"),
            imgs, fps=15)
        if masks_u8:
            imageio.mimsave(
                os.path.join(dir_name,
                             f"{cfg.exp_name}_mirror_mask_{typ_final}.gif"),
                masks_u8, fps=15)
        if depth_maps and not args.not_save_depth:
            arr = np.stack(depth_maps)
            norm = (arr - arr.min()) / max(arr.max() - arr.min(), 1e-8)
            import cv2

            imageio.mimsave(
                os.path.join(dir_name, f"{cfg.exp_name}_depth_{typ_final}.gif"),
                [cv2.applyColorMap((d * 255).astype(np.uint8),
                                   cv2.COLORMAP_JET) for d in norm], fps=15)
            # second pass: globally normalized depth PNGs
            vmin, vmax = float(arr.min()), float(arr.max())
            for i, dep in enumerate(depth_maps):
                imageio.imwrite(
                    os.path.join(sub["depth_unified_normalization"],
                                 f"depth_{typ_final}_{i:03d}.png"),
                    (visualize_depth(dep, vmin, vmax) * 255).astype(np.uint8))
        if depth_reflect_maps:
            arr = np.stack(depth_reflect_maps)
            vmin, vmax = float(arr.min()), float(arr.max())
            for i, (dr, mm) in enumerate(zip(depth_reflect_maps, masks_float)):
                canvas = visualize_depth(dr, vmin, vmax) * mm
                imageio.imwrite(
                    os.path.join(sub["depth_reflect_unified_normalization"],
                                 f"depth_reflect_{typ_final}_{i:03d}.png"),
                    (canvas * 255).astype(np.uint8))
    if psnrs:
        # per-view + mean PSNR/SSIM (reference metrics.py:14-23,
        # tools/eval_metrics.py:25-32); LPIPS joins when $LPIPS_WEIGHTS
        # points at a converted alexnet weights file
        print(f"Mean PSNR ({typ_final}): {np.mean(psnrs):.2f}")
        print(f"Mean SSIM ({typ_final}): {np.mean(ssims):.4f}")
        table = {"mean_psnr": float(np.mean(psnrs)),
                 "psnrs": [float(p) for p in psnrs],
                 "mean_ssim": float(np.mean(ssims)),
                 "ssims": [float(s) for s in ssims]}
        if lpipss:
            print(f"Mean LPIPS ({typ_final}): {np.mean(lpipss):.4f}")
            table["mean_lpips"] = float(np.mean(lpipss))
            table["lpips"] = [float(v) for v in lpipss]
        with open(os.path.join(dir_name, "psnr.json"), "w") as f:
            json.dump(table, f)
    if len(view_secs) > 1:
        # steady-state render rate (first view pays the compiles)
        steady = view_secs[1:]
        rays_per_view = h * w
        print(f"[time] steady-state {np.mean(steady):.2f} s/view "
              f"({rays_per_view / np.mean(steady) / 1e3:.1f}k rays/s), "
              f"first view {view_secs[0]:.1f} s")
    return dir_name


if __name__ == "__main__":
    main()
