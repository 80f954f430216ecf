#!/usr/bin/env python
"""Experiment: amortize tunnel dispatch by rendering K chunks per jit call.

Hypothesis (BASELINE.md): nerf_tpu device-busy is ~1.0M rays/s but wall is
442.8k — the gap is per-dispatch tunnel latency. lax.map over K chunk blocks
inside ONE jit keeps the per-chunk graph (scan body compiles once) while
dispatching K chunks per call.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="nerf_tpu")
    p.add_argument("--chunk", type=int, default=16384)
    p.add_argument("--ks", type=int, nargs="+", default=[1, 4, 10, 20])
    p.add_argument("--total", type=int, default=640_000)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from mirror_nerf_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from mirror_nerf_tpu.core.rays import get_ray_directions, get_rays, \
        make_ray_buffer
    from mirror_nerf_tpu.data.synthetic import camera_ring
    from mirror_nerf_tpu.models.fields import MirrorNeRFField
    from mirror_nerf_tpu.models.tpugrid import TPUGridField
    from mirror_nerf_tpu.render.renderer import RenderSettings
    from mirror_nerf_tpu.render.tracer import TraceSettings, trace_rays

    H = W = 800
    focal = 0.5 * W / np.tan(0.5 * 0.9)
    pose = camera_ring(1)[0]
    dirs = get_ray_directions(H, W, focal)
    o, d = get_rays(dirs, pose)
    rays_all = np.asarray(make_ray_buffer(o, d, 0.05, 8.0))

    if args.model == "nerf":
        field = MirrorNeRFField(predict_normal=True, predict_mirror_mask=True,
                                compute_dtype="bfloat16")
    else:
        field = TPUGridField(bound=6.0, predict_normal=True,
                             predict_mirror_mask=True,
                             compute_dtype="bfloat16")
    params = {"coarse": field.init(jax.random.PRNGKey(0)),
              "fine": field.init(jax.random.PRNGKey(1))}
    rs = RenderSettings(N_samples=64, N_importance=64, perturb=0.0,
                        noise_std=0.0, test_time=True, compute_normal=False,
                        fine_pass="fine", fused_field=True)
    ts = TraceSettings(render=rs, trace_secondary_rays=True,
                       max_recursive_level=2, only_trace_mode="eval",
                       is_eval=False, compact_frac=0.25, compact_level0=True)

    def render_chunk(params, rays, mask, key):
        rgb = trace_rays(field, params, rays, mask, key, ts)["rgb_fine"]
        return jnp.sum(rgb)

    chunk = args.chunk
    for k in args.ks:
        if k == 1:
            jitted = jax.jit(render_chunk)
        else:
            def render_k(params, rays_k, mask_k, keys_k):
                return jax.lax.map(
                    lambda t: render_chunk(params, t[0], t[1], t[2]),
                    (rays_k, mask_k, keys_k))
            jitted = jax.jit(render_k)
        n_calls = max(args.total // (chunk * k), 2)
        try:
            if k == 1:
                rays = jnp.asarray(rays_all[:chunk])
                mask = jnp.full((chunk,), -1.0, jnp.float32)
                key = jax.random.PRNGKey(0)
                fb = jitted(params, rays, mask, key)
            else:
                rays = jnp.asarray(
                    np.broadcast_to(rays_all[None, :chunk], (k, chunk, 8)))
                mask = jnp.full((k, chunk), -1.0, jnp.float32)
                keys = jax.random.split(jax.random.PRNGKey(0), k)
                fb = jitted(params, rays, mask, keys)
            np.asarray(fb)
        except Exception as e:  # noqa: BLE001
            print(f"k={k}: FAILED {type(e).__name__}: {str(e)[:200]}")
            continue
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [jitted(params, rays, mask,
                           keys if k > 1 else jax.random.fold_in(key, i))
                    for i in range(n_calls)]
            for x in outs:
                np.asarray(x)
            dt = time.perf_counter() - t0
            best = max(best, n_calls * chunk * k / dt)
        print(f"k={k} chunk={chunk}: {best/1e3:.1f}k rays/s "
              f"({n_calls} calls x {k*chunk} rays)")


if __name__ == "__main__":
    main()
