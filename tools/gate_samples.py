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

A count may also be "P:S" (e.g. "128:64"): primary budget P with the
secondary (bounce level >= 1) budget reduced to S — the per-level budget
knob (eval.py --secondary_N_samples/--secondary_N_importance; static
shapes make it free on TPU). The gate reference row stays plain 128.

A count of the form "NSpNI" (e.g. "64p64", "64p48") renders the
two-pass PROPOSAL path instead (no --proposal_skip): NS sigma-only coarse
proposal samples -> PDF -> NI full fine samples. Only meaningful on a
checkpoint whose coarse tower trained LIVE (--coarse_grid_lr_mult 1,
round-5 live_proposal arm): a live proposal concentrating NI < 128 fine
samples may match 128-stratified quality at lower full-eval FLOPs — the
remaining eval lever toward 2M rays/s (VERDICT r4 #3/5).
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
    ap.add_argument("--counts", nargs="+", type=str,
                    default=["128", "112", "96", "80", "64"])
    ap.add_argument("--out", default="sweeps/gate_samples.jsonl")
    ap.add_argument("--tag", default="gate")
    ap.add_argument("--extra_flags", nargs=argparse.REMAINDER, default=[])
    args = ap.parse_args(argv)

    rows = []
    for spec in args.counts:
        spec = str(spec)
        sec_flags = []
        skip_flags = ["--proposal_skip"]
        if "p" in spec:  # "NSpNI": live-proposal two-pass row
            ns, ni = (int(v) for v in spec.split("p"))
            skip_flags = []
            label = spec
        else:
            primary, _, sec = spec.partition(":")
            total = int(primary)
            ns = total // 2
            ni = total - ns
            label = str(total)
            if sec:
                st = int(sec)
                sec_flags = ["--secondary_N_samples", str(st // 2),
                             "--secondary_N_importance", str(st - st // 2)]
                label = f"{total}:{st}"
        name = f"{args.tag}_s{label.replace(':', '_')}"
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
               "--fused_field",
               "--ckpt_path", args.ckpt, "--exp_name", name,
               ] + skip_flags + sec_flags + args.extra_flags
        print(f"[gate] total={label}: {' '.join(cmd)}", flush=True)
        r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
        pj = os.path.join(REPO, "results", "blender", name, "psnr.json")
        if r.returncode != 0 or not os.path.exists(pj):
            rows.append({"samples": label,
                         "error": r.stdout[-500:] + r.stderr[-500:]})
            print(f"[gate] total={label} FAILED", flush=True)
            continue
        with open(pj) as f:
            m = json.load(f)
        rows.append({"samples": label, "psnr": m["mean_psnr"],
                     "ssim": m.get("mean_ssim")})
        print(f"[gate] total={label}: PSNR {m['mean_psnr']:.3f} "
              f"SSIM {m.get('mean_ssim', float('nan')):.4f}", flush=True)

    ref = next((r["psnr"] for r in rows if r.get("samples") == "128"
                and "psnr" in r), None)
    with open(os.path.join(REPO, args.out), "a") as f:
        f.write(json.dumps({"ckpt": args.ckpt, "tag": args.tag,
                            "rows": rows}) + "\n")
    print("\nsamples  PSNR     dPSNR    SSIM")
    for r in rows:
        if "psnr" not in r:
            print(f"{r['samples']:>7}  FAILED")
            continue
        dp = (r["psnr"] - ref) if ref is not None else float("nan")
        print(f"{r['samples']:>7}  {r['psnr']:7.3f}  {dp:+7.3f}  "
              f"{(r['ssim'] or float('nan')):.4f}")


if __name__ == "__main__":
    main()
