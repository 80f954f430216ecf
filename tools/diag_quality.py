#!/usr/bin/env python
"""Decompose the held-out quality gap on the procedural dense-ring scene.

The dense scene has exact analytic ground truth (mirror plane z = -2.5 with
normal +z, GT masks for every view), so the prediction-driven eval PSNR can
be split into its failure sources per test view:

  1. psnr_pred        — full prediction-driven render (the eval protocol)
  2. psnr_gtmask      — same render but the LEVEL-0 mirror mask comes from GT
                        (isolates mirror-mask prediction error)
  3. mask IoU / false-pos / false-neg of the resolved mask vs GT
  4. reflect-direction angular error vs the analytic reflection (deg),
     over GT mirror pixels (isolates normal-head error)
  5. secondary-origin plane error |z_surface + 2.5| over GT mirror pixels
     (isolates depth/surface error on the mirror)
  6. psnr of the DIRECT branch outside the mirror (radiance-only quality)
  7. psnr inside vs outside the mirror region

Usage:
  python tools/diag_quality.py --ckpt logs/<run>/last.ckpt.npz \
      [--root scenes/dense96] [--model_type nerf_tpu] [--grid_levels ...]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MIRROR_NORMAL = np.array([0.0, 0.0, 1.0])
MIRROR_Z = -2.5  # data/synthetic.py: mirror on the z = -HALF wall


def psnr(a, b):
    m = float(np.mean((a - b) ** 2))
    return 10 * np.log10(1.0 / max(m, 1e-10))


def masked_psnr(a, b, m):
    if m.sum() < 1:
        return float("nan")
    d = ((a - b) ** 2)[m]
    return 10 * np.log10(1.0 / max(float(d.mean()), 1e-10))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--root", default="scenes/dense96")
    ap.add_argument("--model_type", default="nerf_tpu")
    ap.add_argument("--grid_levels", default="64:64,256:64,512:64")
    ap.add_argument("--img_wh", nargs=2, type=int, default=[320, 240])
    ap.add_argument("--chunk", type=int, default=8192)
    ap.add_argument("--max_recursive_level", type=int, default=2)
    args = ap.parse_args()

    import jax

    from mirror_nerf_tpu.config import Config
    from mirror_nerf_tpu.data.blender import BlenderDataset
    from mirror_nerf_tpu.models.fields import make_field
    from mirror_nerf_tpu.train.checkpoints import load_params_any
    from mirror_nerf_tpu.train.loop import (make_trace_settings,
                                            render_image_chunked)

    cfg = Config(
        root_dir=args.root, img_wh=tuple(args.img_wh), near=0.05, far=12.0,
        bound=6.0, model_type=args.model_type, grid_levels=args.grid_levels,
        predict_normal=True, predict_mirror_mask=True,
        trace_secondary_rays=True, N_importance=64,
        max_recursive_level=args.max_recursive_level, chunk=args.chunk,
    )
    field = make_field(cfg)
    like = {"coarse": field.init(jax.random.PRNGKey(0)),
            "fine": field.init(jax.random.PRNGKey(1))}
    params = load_params_any(args.ckpt, like, field=field)
    ds = BlenderDataset(args.root, "test", cfg.img_wh, cfg)
    ts = make_trace_settings(cfg, epoch=10 ** 6, geometry_stage=False,
                             is_eval=True, test_time=True)
    keys = ("rgb_fine", "rgb_fine_direct", "mirror_mask_resolved",
            "reflect_direction", "secondary_rays_o", "depth_fine")

    rows = []
    for i in range(len(ds)):
        sample = ds.get_image(i)
        rays = np.asarray(sample["rays"], np.float32)
        gt = np.asarray(sample["rgbs"], np.float32)
        gt_mask = np.asarray(sample["mirror_mask"], np.float32)
        rng = jax.random.PRNGKey(i)

        pred = render_image_chunked(field, params, rays, None, rng, ts,
                                    chunk=cfg.chunk, keys=keys)
        gtm = render_image_chunked(field, params, rays, gt_mask, rng, ts,
                                   chunk=cfg.chunk, keys=keys)

        inm = gt_mask > 0.5
        res_mask = np.asarray(pred["mirror_mask_resolved"]) > 0.5
        inter = float((res_mask & inm).sum())
        union = float((res_mask | inm).sum())
        # analytic reflection of the primary dirs at the mirror normal
        d = rays[:, 3:6]
        r_true = d - 2.0 * (d @ MIRROR_NORMAL)[:, None] * MIRROR_NORMAL
        r_pred = np.asarray(pred["reflect_direction"])
        r_pred = r_pred / np.maximum(
            np.linalg.norm(r_pred, axis=-1, keepdims=True), 1e-9)
        cosang = np.clip((r_pred * r_true).sum(-1), -1, 1)
        ang_err = np.degrees(np.arccos(cosang))
        z_err = np.abs(np.asarray(pred["secondary_rays_o"])[:, 2] - MIRROR_Z)

        row = {
            "view": i,
            "psnr_pred": psnr(np.asarray(pred["rgb_fine"]), gt),
            "psnr_gtmask": psnr(np.asarray(gtm["rgb_fine"]), gt),
            "mask_iou": inter / max(union, 1),
            "mask_false_pos": float((res_mask & ~inm).mean()),
            "mask_false_neg": float((~res_mask & inm).mean()),
            "reflect_ang_err_deg_mean": float(ang_err[inm].mean()),
            "reflect_ang_err_deg_p90": float(np.percentile(ang_err[inm], 90)),
            "surface_z_err_mean": float(z_err[inm].mean()),
            "psnr_inside_mirror": masked_psnr(
                np.asarray(pred["rgb_fine"]), gt, inm),
            "psnr_outside_mirror": masked_psnr(
                np.asarray(pred["rgb_fine"]), gt, ~inm),
            "psnr_gtmask_inside": masked_psnr(
                np.asarray(gtm["rgb_fine"]), gt, inm),
            "psnr_direct_outside": masked_psnr(
                np.asarray(pred["rgb_fine_direct"]), gt, ~inm),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    mean = {k: float(np.mean([r[k] for r in rows]))
            for k in rows[0] if k != "view"}
    print("MEAN:", json.dumps(mean))


if __name__ == "__main__":
    main()
