#!/usr/bin/env python
"""Offline metrics: PSNR / SSIM / LPIPS over saved renders vs ground truth.

Capability parity with reference `tools/eval_metrics.py`: walks a split's
`transforms_*.json`, loads each `rgb_fine_{idx:03d}.png` from the result dir,
white-blends RGBA ground truth, and prints mean PSNR / SSIM / LPIPS. SSIM is
the standard Gaussian-window implementation (skimage is not in the image);
LPIPS requires local perceptual weights (LPIPS_WEIGHTS env or --lpips_weights)
and reports NaN without them (zero-egress environment).
"""

from __future__ import annotations

import json
import os
import sys
from argparse import ArgumentParser

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mirror_nerf_tpu.eval.metrics import lpips, psnr, ssim  # noqa: E402


def get_opts(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--split_path", type=str, required=True)
    parser.add_argument("--res_img_dir", type=str, required=True)
    parser.add_argument("--lpips_weights", type=str, default=None)
    return parser.parse_args(argv)


def load_image(path, resize_wh=None):
    from PIL import Image

    img = Image.open(path)
    if resize_wh is not None:
        img = img.resize(resize_wh, Image.LANCZOS)
    arr = np.asarray(img, np.float32) / 255.0
    if arr.ndim == 3 and arr.shape[-1] == 4:
        arr = arr[..., :3] * arr[..., 3:4] + (1 - arr[..., 3:4])
    return arr


def main(argv=None):
    args = get_opts(argv)
    with open(args.split_path) as f:
        meta = json.load(f)
    root_dir = os.path.split(args.split_path)[0]
    all_psnr, all_ssim, all_lpips = [], [], []
    for idx, frame in enumerate(meta["frames"]):
        res_path = os.path.join(args.res_img_dir, f"rgb_fine_{idx:03d}.png")
        if not os.path.exists(res_path):
            continue
        res = load_image(res_path)
        fp = frame["file_path"]
        gt_path = os.path.join(root_dir, fp if fp.endswith(".png")
                               or fp.endswith(".jpg") else f"{fp}.png")
        gt = load_image(gt_path, resize_wh=(res.shape[1], res.shape[0]))
        all_psnr.append(psnr(res, gt))
        all_ssim.append(ssim(res, gt))
        all_lpips.append(lpips(res, gt, args.lpips_weights))
    n = max(len(all_psnr), 1)
    out = {
        "mean_psnr": float(np.sum(all_psnr) / n),
        "mean_ssim": float(np.sum(all_ssim) / n),
        "mean_lpips": float(np.sum(all_lpips) / n),
        "n": len(all_psnr),
    }
    print("Mean PSNR {mean_psnr} SSIM {mean_ssim} LPIPS {mean_lpips}".format(
        **out))
    return out


if __name__ == "__main__":
    main()
