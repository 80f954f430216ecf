#!/usr/bin/env python
"""Regenerate the procedural benchmark scenes (deterministic).

The sweep/eval protocols reference two on-disk scenes that are generated
artifacts (the environment wipes non-tracked files between rounds):

  * scenes/dense96  — the dense-ring quality protocol (96 train views,
    320x240; STATUS.md round-2/3 quality evidence).
  * scenes/paper400 — the reference-protocol record (400x300, the
    reference's synthetic eval resolution, run.sh:259-280 analog).

Both use the same camera ring and the exact analytic tracer
(mirror_nerf_tpu/data/synthetic.py), so regeneration is bit-reproducible.

Usage: python tools/make_scenes.py [--only dense96|paper400]
"""
from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from mirror_nerf_tpu.data.synthetic import (generate_scene,  # noqa: E402
                                            generate_scene_colmap)

SCENES = {
    "dense96": dict(n_train=96, n_val=2, n_test=4, img_wh=(320, 240)),
    "paper400": dict(n_train=96, n_val=2, n_test=4, img_wh=(400, 300)),
    # COLMAP-reconstruction layout (sparse/*.bin) — exercises the
    # real-capture parser->trainer seam end-to-end (VERDICT r4 #8)
    "colmap48": dict(colmap=True, n_images=48, img_wh=(320, 240)),
}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", choices=sorted(SCENES), default=None)
    ap.add_argument("--out_root", default=os.path.join(REPO, "scenes"))
    args = ap.parse_args(argv)
    for name, kw in SCENES.items():
        if args.only and name != args.only:
            continue
        kw = dict(kw)
        is_colmap = kw.pop("colmap", False)
        root = os.path.join(args.out_root, name)
        marker = ("sparse/cameras.bin" if is_colmap
                  else "transforms_train.json")
        if os.path.exists(os.path.join(root, marker)):
            print(f"[scenes] {name}: exists, skipping")
            continue
        print(f"[scenes] generating {name} {kw} -> {root}", flush=True)
        (generate_scene_colmap if is_colmap else generate_scene)(root, **kw)
    print("[scenes] done")


if __name__ == "__main__":
    main()
