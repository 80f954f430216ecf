#!/usr/bin/env python
"""Quality-gate the proposal-skip eval sample budget on a trained ckpt.

With `--proposal_skip` the eval pipeline is ONE stratified fine pass of
N_samples + N_importance samples (the coarse proposal is dropped — see
BASELINE.md round 4: champion CP-grid checkpoints train a dead proposal).
Per-ray eval cost is then linear in the sample count and encoder-FLOP-bound
(BASELINE.md rays-mode budget), so the count is the remaining quality/speed
lever: 96 samples ≈ 1.33x the 128-sample throughput IF quality holds.

This tool renders the held-out split at several counts and prints a
PSNR/SSIM table; the policy (BASELINE.md precedent) is that a reduced count
may become an eval/bench default only within 0.05 dB of the 128-sample
render. Re-gate per checkpoint.

Usage:
  python tools/gate_samples.py --ckpt logs/<run>/last.ckpt.npz \
      [--root_dir scenes/dense96] [--img_wh 320 240] \
      [--counts 128 112 96 80 64] [--extra_flags ...]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--root_dir", default="scenes/dense96")
    ap.add_argument("--img_wh", nargs=2, type=int, default=[320, 240])
    ap.add_argument("--counts", nargs="+", type=int,
                    default=[128, 112, 96, 80, 64])
    ap.add_argument("--out", default="sweeps/gate_samples.jsonl")
    ap.add_argument("--tag", default="gate")
    ap.add_argument("--extra_flags", nargs=argparse.REMAINDER, default=[])
    args = ap.parse_args(argv)

    rows = []
    for total in args.counts:
        ns = total // 2
        ni = total - ns
        name = f"{args.tag}_s{total}"
        cmd = [sys.executable, "eval.py",
               "--dataset_name", "blender", "--root_dir", args.root_dir,
               "--img_wh", str(args.img_wh[0]), str(args.img_wh[1]),
               "--near", "0.05", "--far", "12.0", "--bound", "6",
               "--scale_factor", "1", "--model_type", "nerf_tpu",
               "--predict_normal", "--predict_mirror_mask",
               "--trace_secondary_rays",
               "--N_samples", str(ns), "--N_importance", str(ni),
               "--chunk", "16384", "--split", "test",
               "--max_recursive_level", "2",
               "--fused_field", "--proposal_skip",
               "--ckpt_path", args.ckpt, "--exp_name", name,
               ] + args.extra_flags
        print(f"[gate] total={total}: {' '.join(cmd)}", flush=True)
        r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
        pj = os.path.join(REPO, "results", "blender", name, "psnr.json")
        if r.returncode != 0 or not os.path.exists(pj):
            rows.append({"samples": total,
                         "error": r.stdout[-500:] + r.stderr[-500:]})
            print(f"[gate] total={total} FAILED", flush=True)
            continue
        with open(pj) as f:
            m = json.load(f)
        rows.append({"samples": total, "psnr": m["mean_psnr"],
                     "ssim": m.get("mean_ssim")})
        print(f"[gate] total={total}: PSNR {m['mean_psnr']:.3f} "
              f"SSIM {m.get('mean_ssim', float('nan')):.4f}", flush=True)

    ref = next((r["psnr"] for r in rows if r.get("samples") == 128
                and "psnr" in r), None)
    with open(os.path.join(REPO, args.out), "a") as f:
        f.write(json.dumps({"ckpt": args.ckpt, "tag": args.tag,
                            "rows": rows}) + "\n")
    print("\nsamples  PSNR     dPSNR    SSIM")
    for r in rows:
        if "psnr" not in r:
            print(f"{r['samples']:7d}  FAILED")
            continue
        dp = (r["psnr"] - ref) if ref is not None else float("nan")
        print(f"{r['samples']:7d}  {r['psnr']:7.3f}  {dp:+7.3f}  "
              f"{(r['ssim'] or float('nan')):.4f}")


if __name__ == "__main__":
    main()
