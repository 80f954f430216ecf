#!/usr/bin/env python
"""Decompose the composite CP kernel's device budget on hardware.

Times (a) plain per-sample kernel, (b) composite kernel (TRI+SUM inside),
(c) sigma-only composite — at the bench shapes (S=128 fine / S=64 coarse)
across lanes. The delta (b)-(a) is the in-kernel compositing cost; if it is
large the (1,L)@(L,L) TRI matmul (1/128 MXU row utilization) is the lever.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rays", type=int, default=8192)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--lanes", type=int, nargs="+", default=[1024, 2048])
    args = p.parse_args()

    from mirror_nerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mirror_nerf_tpu.models.tpugrid import TPUGridField
    from mirror_nerf_tpu.ops.pallas.fused_cp import (
        fused_cp_rays_composite, fused_cp_rays_eval)

    field = TPUGridField(bound=6.0, predict_normal=True,
                         predict_mirror_mask=True, compute_dtype="bfloat16")
    params = field.init(jax.random.PRNGKey(0))
    n = args.rays
    key = jax.random.PRNGKey(1)
    o = jax.random.uniform(key, (n, 3), minval=-1, maxval=1)
    d = jax.random.normal(key, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    def timeit(fn, *a, **kw):
        f = jax.jit(lambda *a: fn(field, params, *a, **kw))
        out = f(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = f(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / args.iters

    for lanes in args.lanes:
        os.environ["MNERF_CP_LANES"] = str(lanes)
        for s in (64, 128):
            z = jnp.linspace(0.05, 8.0, s)[None].repeat(n, 0)
            tot = n * s
            t_plain = timeit(fused_cp_rays_eval, o, d, o * 0 + d, z)
            t_comp = timeit(fused_cp_rays_composite, o, d, o * 0 + d, z)
            t_sig = timeit(fused_cp_rays_composite, o, d, o * 0 + d, z,
                           sigma_only=True)
            t_psig = timeit(fused_cp_rays_eval, o, d, o * 0 + d, z,
                            sigma_only=True)
            print(f"lanes={lanes} S={s}: plain {tot/t_plain/1e6:7.1f} Mpt/s"
                  f" ({t_plain*1e3:6.2f} ms) | composite"
                  f" {tot/t_comp/1e6:7.1f} Mpt/s ({t_comp*1e3:6.2f} ms) |"
                  f" sigma-comp {tot/t_sig/1e6:7.1f} Mpt/s"
                  f" ({t_sig*1e3:6.2f} ms) | sigma-plain"
                  f" {tot/t_psig/1e6:7.1f} Mpt/s ({t_psig*1e3:6.2f} ms)",
                  flush=True)


if __name__ == "__main__":
    main()
