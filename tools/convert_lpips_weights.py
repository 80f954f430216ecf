#!/usr/bin/env python
"""Convert LPIPS(alex) torch weights to the npz layout `eval/lpips_jax.py` reads.

The reference computes LPIPS through the `lpips` pip package
(`/root/reference/tools/eval_metrics.py:19-85`), whose state is split across
two torch files: torchvision's AlexNet features (``features.{0,3,6,8,10}``)
and the lpips package's learned ``lin{i}`` 1x1 convs (``alex.pth``). This
tool merges one or two such state-dicts and writes the canonical npz
(``conv{i}/w`` OIHW, ``conv{i}/b``, ``lin{i}/w``) so that
``LPIPS_WEIGHTS=weights.npz`` lights up the metric with zero code changes.

Usage:
  python tools/convert_lpips_weights.py alexnet.pth [alex_lins.pth] -o lpips_alex.npz
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from mirror_nerf_tpu.eval.lpips_jax import _ALEX, _load_weights  # noqa: E402


def convert(paths: list[str], out_path: str) -> dict:
    """Merge torch state-dict files (or one combined file) into the npz."""
    import torch

    merged: dict = {}
    for p in paths:
        if p.endswith(".npz"):
            data = np.load(p)
            merged.update({k: data[k] for k in data.files})
            continue
        obj = torch.load(p, map_location="cpu", weights_only=False)
        sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
        merged.update({k: np.asarray(v.detach() if hasattr(v, "detach") else v,
                                     np.float32)
                       for k, v in sd.items() if hasattr(v, "shape")})
    # Reuse the canonical key-mapping by round-tripping through a temp .pt
    # would be wasteful; _load_weights' torch branch already implements the
    # mapping, so feed it the merged dict via an in-memory torch save.
    import io

    buf = io.BytesIO()
    torch.save(merged, buf)
    tmp = out_path + ".merged.pt"
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
    try:
        weights = _load_weights(tmp)
    finally:
        os.remove(tmp)
    _validate(weights)
    np.savez(out_path, **weights)
    return weights


def _validate(weights: dict) -> None:
    in_ch = 3
    for i, (out_ch, k, _, _) in enumerate(_ALEX):
        w = weights[f"conv{i}/w"]
        b = weights[f"conv{i}/b"]
        lin = weights[f"lin{i}/w"]
        if w.shape != (out_ch, in_ch, k, k):
            raise ValueError(f"conv{i}/w shape {w.shape} != "
                             f"{(out_ch, in_ch, k, k)}")
        if b.shape != (out_ch,):
            raise ValueError(f"conv{i}/b shape {b.shape} != {(out_ch,)}")
        if lin.shape != (out_ch,):
            raise ValueError(f"lin{i}/w shape {lin.shape} != {(out_ch,)}")
        in_ch = out_ch


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("torch_files", nargs="+",
                    help="torch state-dict file(s): AlexNet features and/or "
                         "lpips lin weights (one combined file is fine)")
    ap.add_argument("-o", "--out", default="lpips_alex.npz")
    args = ap.parse_args()
    weights = convert(args.torch_files, args.out)
    total = sum(int(np.prod(v.shape)) for v in weights.values())
    print(f"[convert_lpips] wrote {args.out}: {len(weights)} arrays, "
          f"{total:,} params. Activate with LPIPS_WEIGHTS={args.out}")


if __name__ == "__main__":
    main()
