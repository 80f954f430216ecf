#!/usr/bin/env python
"""One-command quality-parity harness vs the reference implementation.

Given a reference scene directory and a checkpoint (either a published torch
`.ckpt` from the reference — imported through the ckpt shim — or one of our
`.npz` checkpoints), this renders the requested split through the full eval
path and prints a PSNR / SSIM / LPIPS table against ground truth. If a
directory of reference-rendered images is supplied (`--ref_results`, e.g. the
output tree of reference `eval.py`), the same metrics are computed for those
renders and the per-metric delta (ours − reference) is reported, which is the
parity number the paper tables use (reference `tools/eval_metrics.py`).

Usage (the moment real data/ckpts exist):
  python tools/parity_check.py --scene_dir /data/washington \
      --ckpt /ckpts/washington.ckpt --img_wh 800 800 \
      [--ref_results /renders/washington_ref] [--lpips_weights alex.npz] \
      [-- --N_samples 64 --N_importance 64 ...extra eval.py flags]

Runs end-to-end today on the procedural synthetic scene + an npz checkpoint
(exercised by tests/test_parity_harness.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def get_opts(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--scene_dir", type=str, required=True)
    p.add_argument("--ckpt", type=str, required=True,
                   help="torch .ckpt (reference release) or our .npz")
    p.add_argument("--dataset_name", type=str, default=None,
                   help="blender/llff/arkit; default: autodetect")
    p.add_argument("--split", type=str, default="test")
    p.add_argument("--img_wh", type=int, nargs=2, default=[800, 800])
    p.add_argument("--ref_results", type=str, default=None,
                   help="dir of reference-rendered rgb PNGs for the delta")
    p.add_argument("--lpips_weights", type=str,
                   default=os.environ.get("LPIPS_WEIGHTS"))
    p.add_argument("--out", type=str, default=None,
                   help="write the result table as JSON here")
    p.add_argument("--exp_name", type=str, default="parity")
    argv = sys.argv[1:] if argv is None else argv
    extra = []
    if "--" in argv:
        i = argv.index("--")
        argv, extra = argv[:i], argv[i + 1:]
    return p.parse_args(argv), extra


def _autodetect_dataset(scene_dir: str) -> str:
    if os.path.exists(os.path.join(scene_dir, "transforms_train.json")):
        return "blender"
    if os.path.exists(os.path.join(scene_dir, "sparse")):
        return "llff"
    return "arkit"


def _metrics_over_dir(img_dir: str, pattern: str, scene_dir: str,
                      split: str, lpips_weights):
    """PSNR/SSIM/LPIPS of `pattern`-named renders in img_dir vs scene GT."""
    from tools.eval_metrics import load_image

    from mirror_nerf_tpu.eval.metrics import lpips, psnr, ssim

    split_path = os.path.join(scene_dir, f"transforms_{split}.json")
    with open(split_path) as f:
        meta = json.load(f)
    rows = []
    for idx, frame in enumerate(meta["frames"]):
        res_path = os.path.join(img_dir, pattern.format(idx=idx))
        if not os.path.exists(res_path):
            continue
        res = load_image(res_path)
        fp = frame["file_path"]
        gt_path = os.path.join(scene_dir, fp if fp.endswith((".png", ".jpg"))
                               else f"{fp}.png")
        gt = load_image(gt_path, resize_wh=(res.shape[1], res.shape[0]))
        rows.append({
            "idx": idx,
            "psnr": float(psnr(res, gt)),
            "ssim": float(ssim(res, gt)),
            "lpips": float(lpips(res, gt, lpips_weights)),
        })
    return rows


def _mean(rows, key):
    return float(np.mean([r[key] for r in rows])) if rows else float("nan")


def main(argv=None):
    args, extra = get_opts(argv)
    import eval as eval_cli

    dataset = args.dataset_name or _autodetect_dataset(args.scene_dir)
    eval_argv = [
        "--root_dir", args.scene_dir, "--dataset_name", dataset,
        "--img_wh", str(args.img_wh[0]), str(args.img_wh[1]),
        "--ckpt_path", args.ckpt, "--split", args.split,
        "--exp_name", args.exp_name,
        "--predict_normal", "--predict_mirror_mask",
        "--trace_secondary_rays",
        *extra,
    ]
    print(f"[parity] rendering {args.split} split: eval.py "
          + " ".join(eval_argv))
    out_dir = eval_cli.main(eval_argv)

    ours = _metrics_over_dir(out_dir, "rgb_fine_{idx:03d}.png",
                             args.scene_dir, args.split, args.lpips_weights)
    result = {
        "scene": args.scene_dir,
        "ckpt": args.ckpt,
        "n_views": len(ours),
        "ours": {k: _mean(ours, k) for k in ("psnr", "ssim", "lpips")},
        "per_view": ours,
    }

    if args.ref_results:
        # accept both our naming and the reference's bare {idx:03d}.png
        for pat in ("rgb_fine_{idx:03d}.png", "{idx:03d}.png"):
            ref = _metrics_over_dir(args.ref_results, pat, args.scene_dir,
                                    args.split, args.lpips_weights)
            if ref:
                break
        result["reference"] = {k: _mean(ref, k)
                               for k in ("psnr", "ssim", "lpips")}
        result["delta"] = {k: result["ours"][k] - result["reference"][k]
                           for k in ("psnr", "ssim", "lpips")}

    hdr = f"{'':12s} {'PSNR':>8s} {'SSIM':>8s} {'LPIPS':>8s}"
    print(hdr)
    print(f"{'ours':12s} {result['ours']['psnr']:8.3f} "
          f"{result['ours']['ssim']:8.4f} {result['ours']['lpips']:8.4f}")
    if "reference" in result:
        r, d = result["reference"], result["delta"]
        print(f"{'reference':12s} {r['psnr']:8.3f} {r['ssim']:8.4f} "
              f"{r['lpips']:8.4f}")
        print(f"{'delta':12s} {d['psnr']:+8.3f} {d['ssim']:+8.4f} "
              f"{d['lpips']:+8.4f}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)
    return result


if __name__ == "__main__":
    main()
