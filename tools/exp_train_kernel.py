#!/usr/bin/env python
"""Microbenchmark the fused TRAIN kernels (ops/pallas/fused_cp_train.py)
standalone: forward (tangents on/off) and backward, at a realistic sample
count (batch 1024 reflection-stage step ≈ 1024·192 primary + secondary
samples). Used to attribute the train step's Pallas time between the
forward/backward calls and to A/B kernel changes without the full Trainer.

Usage: python tools/exp_train_kernel.py [--samples 196608] [--iters 30]
         [--lanes 512]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timeit(fn, iters):
    import jax

    r = fn()  # compile
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--samples", type=int, default=196608)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--lanes", type=int, default=0,
                   help="override MNERF_TRAIN_LANES (0 = leave as-is)")
    args = p.parse_args(argv)
    if args.lanes:
        os.environ["MNERF_TRAIN_LANES"] = str(args.lanes)

    import jax
    import jax.numpy as jnp

    from mirror_nerf_tpu.models.tpugrid import TPUGridField
    from mirror_nerf_tpu.ops.pallas.fused_cp_train import (
        density_fused, density_with_grad_fused)

    field = TPUGridField(predict_normal=True, predict_mirror_mask=True,
                         bound=6.0)
    params = field.init(jax.random.PRNGKey(0))
    n = args.samples
    x = jax.random.uniform(jax.random.PRNGKey(1), (n, 3),
                           minval=-6.0, maxval=6.0)
    cs = jax.random.normal(jax.random.PRNGKey(2), (n,))
    cg = jax.random.normal(jax.random.PRNGKey(3), (n, 15))
    cn = jax.random.normal(jax.random.PRNGKey(4), (n, 3))

    fwd_g = jax.jit(lambda p, xx: density_with_grad_fused(field, p, xx))
    fwd_d = jax.jit(lambda p, xx: density_fused(field, p, xx))

    def vjp_g(p, xx):
        out, pull = jax.vjp(
            lambda pp: density_with_grad_fused(field, pp, xx), p)
        return pull((cs, cg, cn))

    def vjp_d(p, xx):
        out, pull = jax.vjp(lambda pp: density_fused(field, pp, xx), p)
        return pull((cs, cg))

    bwd_g = jax.jit(vjp_g)
    bwd_d = jax.jit(vjp_d)

    res = {}
    res["fwd_grad_ms"] = _timeit(lambda: fwd_g(params, x), args.iters) * 1e3
    res["fwd_dens_ms"] = _timeit(lambda: fwd_d(params, x), args.iters) * 1e3
    res["fwd+bwd_grad_ms"] = _timeit(
        lambda: bwd_g(params, x), args.iters) * 1e3
    res["fwd+bwd_dens_ms"] = _timeit(
        lambda: bwd_d(params, x), args.iters) * 1e3
    res["bwd_grad_ms"] = res["fwd+bwd_grad_ms"] - res["fwd_grad_ms"]
    res["samples"] = n
    res["lanes"] = os.environ.get("MNERF_TRAIN_LANES", "512")
    res["backend"] = jax.default_backend()
    res["Msamples_per_s(fwd+bwd_grad)"] = (
        n / (res["fwd+bwd_grad_ms"] / 1e3) / 1e6)
    for k, v in res.items():
        print(f"{k}: {v if isinstance(v, str) else round(v, 3)}")


if __name__ == "__main__":
    main()
