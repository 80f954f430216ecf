#!/usr/bin/env python
"""Profile one traced render on the TPU and print per-op device time.

Run SOLO — concurrent compiles through this attachment's relay can trip a
libtpu register-allocation bug (see memory notes / STATUS.md). Produces a
TensorBoard-compatible trace under --out and prints the aggregated device
lanes from trace.json.gz.

Usage: python tools/profile_render.py [--chunk 4096] [--iters 4]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--chunk", type=int, default=4096)
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--out", type=str, default="/tmp/mnerf_trace")
    p.add_argument("--compact_frac", type=float, default=0.25)
    p.add_argument("--no_fused", action="store_true",
                   help="profile the unfused XLA field path")
    p.add_argument("--model", choices=["nerf", "nerf_tcnn", "nerf_tpu"],
                   default="nerf")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mirror_nerf_tpu.core.rays import (get_ray_directions, get_rays,
                                           make_ray_buffer)
    from mirror_nerf_tpu.data.synthetic import camera_ring
    from mirror_nerf_tpu.models.fields import MirrorNeRFField
    from mirror_nerf_tpu.render.renderer import RenderSettings
    from mirror_nerf_tpu.render.tracer import TraceSettings, trace_rays

    H = W = 800
    o, d = get_rays(get_ray_directions(H, W, 0.5 * W / np.tan(0.45)),
                    camera_ring(1)[0])
    rays_all = make_ray_buffer(o, d, 0.05, 8.0)
    if args.model == "nerf_tpu":
        from mirror_nerf_tpu.models.tpugrid import TPUGridField

        field = TPUGridField(bound=6.0, predict_normal=True,
                             predict_mirror_mask=True,
                             compute_dtype="bfloat16")
    elif args.model == "nerf_tcnn":
        from mirror_nerf_tpu.models.ngp import NGPField

        field = NGPField(bound=6.0, predict_normal=True,
                         predict_mirror_mask=True,
                         compute_dtype="bfloat16")
    else:
        field = MirrorNeRFField(predict_normal=True, predict_mirror_mask=True,
                            compute_dtype="bfloat16")
    params = {"coarse": field.init(jax.random.PRNGKey(0)),
              "fine": field.init(jax.random.PRNGKey(1))}
    rays = jnp.asarray(rays_all[:args.chunk])
    mask = jnp.full((args.chunk,), -1.0, jnp.float32)
    rs = RenderSettings(N_samples=64, N_importance=64, perturb=0.0,
                        noise_std=0.0, test_time=True, compute_normal=False,
                        fine_pass="fine", fused_field=not args.no_fused)
    ts = TraceSettings(render=rs, trace_secondary_rays=True,
                       max_recursive_level=2, only_trace_mode="eval",
                       is_eval=False, compact_frac=args.compact_frac,
                       compact_level0=not args.no_fused)

    def f(params, rays, mask, key, fb):
        rays = rays.at[:, 6].add(fb * 1e-12)
        return jnp.sum(trace_rays(field, params, rays, mask, key, ts)
                       ["rgb_fine"])

    j = jax.jit(f)
    key = jax.random.PRNGKey(0)
    fb = j(params, rays, mask, key, jnp.float32(0))
    float(fb)

    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        for i in range(args.iters):
            fb = j(params, rays, mask, jax.random.fold_in(key, i), fb)
        float(fb)

    tr = sorted(glob.glob(f"{args.out}/**/*.trace.json.gz", recursive=True))[-1]
    data = json.load(gzip.open(tr))
    pids = {}
    for e in data.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pids.items() if "TPU" in n}
    agg = collections.Counter()
    ops = collections.Counter()
    for e in data.get("traceEvents", []):
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            full = e["name"]
            name = full.split(".")[0][:55]
            if name.startswith("jit_"):
                continue  # parent span; children carry the op-level time
            agg[name] += e.get("dur", 0)
            ops[full[:70]] += e.get("dur", 0)
    total = sum(agg.values())
    print(f"device busy total: {total / 1e3:.1f} ms over {args.iters} iters "
          f"({total / 1e3 / args.iters:.1f} ms/iter, chunk {args.chunk})")
    for name, dur in agg.most_common(12):
        print(f"  {dur / 1e3:8.2f} ms {100 * dur / max(total, 1):5.1f}%  "
              f"{name}")
    print("top individual ops:")
    for name, dur in ops.most_common(25):
        print(f"  {dur / 1e3:8.2f} ms {100 * dur / max(total, 1):5.1f}%  "
              f"{name}")
    print(f"trace: {tr}")


if __name__ == "__main__":
    main()
