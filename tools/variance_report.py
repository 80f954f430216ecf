#!/usr/bin/env python
"""Multi-seed variance protocol (VERDICT r4 #6).

Reads var_seed* arms from a sweep results JSONL (identical champion recipe,
seeds 1..N, the short 12-epoch dense-ring protocol), prints mean ± std of
the held-out PSNR per eval path, and restates the gate thresholds in sigma
units: a single-run delta D between two TRAINING runs is meaningful only at
|D| > 2*sqrt(2)*sigma (two independent draws); same-checkpoint EVAL deltas
stay deterministic and keep the 0.05 dB bar.

Usage: python tools/variance_report.py [--results sweeps/results_r5.jsonl]
       [--prefix var_seed]
"""
from __future__ import annotations

import argparse
import json
import math
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", default="sweeps/results_r5.jsonl")
    ap.add_argument("--prefix", default="var_seed")
    args = ap.parse_args(argv)

    arms = []
    with open(os.path.join(REPO, args.results)) as f:
        for ln in f:
            r = json.loads(ln)
            if r.get("name", "").startswith(args.prefix) \
                    and r.get("status") == "ok":
                arms.append(r)
    if len(arms) < 2:
        print(f"need >= 2 completed {args.prefix}* arms, have {len(arms)}")
        return 1

    print(f"{len(arms)} seeds: "
          + ", ".join(a["name"] for a in arms))
    # a diverged run (grid-lr divergence signature: PSNR ~5) is not noise
    # around a mean — report the divergence RATE separately and compute
    # mean/std over converged runs only
    div = [a["name"] for a in arms
           if isinstance(a.get("psnr_unfused"), dict)
           and a["psnr_unfused"].get("mean_psnr", 0) < 10.0]
    if div:
        print(f"DIVERGED ({len(div)}/{len(arms)}): {', '.join(div)} — "
              "excluded from mean/std; divergence rate is part of the "
              "protocol result")
        arms = [a for a in arms if a["name"] not in div]
    out = {}
    for tag in ("psnr_unfused", "psnr_fused", "psnr_fused_skip"):
        vals = [a[tag]["mean_psnr"] for a in arms
                if isinstance(a.get(tag), dict) and "mean_psnr" in a[tag]]
        if len(vals) < 2:
            continue
        n = len(vals)
        mean = sum(vals) / n
        std = math.sqrt(sum((v - mean) ** 2 for v in vals) / (n - 1))
        out[tag] = (mean, std, vals)
        print(f"{tag:>16}: {mean:6.2f} ± {std:.2f} dB  "
              f"(n={n}: {', '.join(f'{v:.2f}' for v in vals)})")
    if out:
        sig = max(s for _, s, _ in out.values())
        thresh = 2 * math.sqrt(2) * sig
        print(f"\nrun-to-run sigma (worst path): {sig:.2f} dB")
        print(f"=> single-run TRAINING-comparison significance bar "
              f"(2*sqrt(2)*sigma): {thresh:.2f} dB")
        print("   (same-ckpt EVAL deltas are deterministic; the 0.05 dB "
              "gate stands there)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
