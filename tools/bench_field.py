#!/usr/bin/env python
"""Microbenchmark the field forward: unfused XLA vs fused Pallas variants.

Measures points/sec for the full MirrorNeRF field (trunk + all heads) on the
real TPU, using the dependent-chain timing methodology from bench.py (only a
value fetch synchronizes on this attachment).

Usage: python tools/bench_field.py [--n 1048576] [--iters 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(jitted, args, feedback_idx, n_pts, iters):
    import jax

    fb = jitted(*args)
    jax.block_until_ready(fb)
    float(fb)
    t0 = time.perf_counter()
    for _ in range(iters):
        a = list(args)
        a[feedback_idx] = a[feedback_idx] + fb * 1e-20
        fb = jitted(*a)
    float(fb)
    dt = time.perf_counter() - t0
    return iters * n_pts / dt


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1 << 20)
    p.add_argument("--iters", type=int, default=8)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from mirror_nerf_tpu.models.embedding import posenc
    from mirror_nerf_tpu.models.fields import MirrorNeRFField
    from mirror_nerf_tpu.ops.pallas import fused_mlp as fm

    n = args.n
    field = MirrorNeRFField(predict_normal=True, predict_mirror_mask=True,
                            compute_dtype="bfloat16")
    params = field.init(jax.random.PRNGKey(0))
    xyz = jax.random.uniform(jax.random.PRNGKey(1), (n, 3), jnp.float32,
                             -1.0, 1.0)
    dirs = jax.random.normal(jax.random.PRNGKey(2), (n, 3), jnp.float32)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    # ---- unfused XLA (full heads like the fine eval pass) ----
    def unfused(params, xyz, dirs):
        sigma, geo = field.density(params, xyz)
        rgb = field.color(params, geo, dirs)
        nrm = field.normal_head(params, geo)
        mir = field.mirror_head(params, geo)
        return (jnp.sum(sigma) + jnp.sum(rgb) + jnp.sum(nrm)
                + jnp.sum(mir)).astype(jnp.float32)

    r = timeit(jax.jit(unfused), (params, xyz, dirs), 1, n, args.iters)
    print(f"unfused XLA bf16:            {r / 1e6:8.1f} M pts/s")

    # ---- fused pallas ----
    packed = fm.pack_params(params)
    spec = fm.FusedSpec()

    xe = fm.pad_batch(posenc(xyz, 10), fm.XE_DIM)
    de = fm.pad_batch(posenc(dirs, 4), fm.DE_DIM)

    def fused(packed, xe, de):
        out = fm.fused_forward(packed, xe, de, spec)
        return jnp.sum(out)

    r = timeit(jax.jit(fused), (packed, xe, de), 1, n, args.iters)
    print(f"fused pallas (posenc ex):    {r / 1e6:8.1f} M pts/s")

    # ---- fused pallas including posenc from raw xyz (end-to-end) ----
    def fused_e2e(packed, xyz, dirs):
        xe = fm.pad_batch(posenc(xyz, 10), fm.XE_DIM)
        de = fm.pad_batch(posenc(dirs, 4), fm.DE_DIM)
        out = fm.fused_forward(packed, xe, de, spec)
        return jnp.sum(out)

    r = timeit(jax.jit(fused_e2e), (packed, xyz, dirs), 1, n, args.iters)
    print(f"fused pallas (posenc in XLA):{r / 1e6:8.1f} M pts/s")


if __name__ == "__main__":
    main()
