#!/usr/bin/env python
"""Isolate the per-pallas_call invocation cost on this TPU attachment.

The rays-mode io ablations (tools/exp_cp_ablate.py) measure ~0.45 ms for a
trivial-body kernel REGARDLESS of grid steps (32/64/128) or total samples
(0.25M/0.5M) — i.e. a fixed per-invocation cost, not per-step or per-byte.
This probe times, inside ONE jitted dispatch (chained fori_loop on a
scalar so nothing overlaps or CSEs):

  a. xla_only     — the chain body with a jnp op only (loop floor)
  b. pallas_min   — + a 1-step pallas_call on one (8, 128) block
  c. pallas_grid  — + a 128-step pallas_call on (1, 4096) blocks
  d. pallas_two   — + TWO 1-step pallas_calls (does cost scale per call?)

If (b − a) ≈ 0.45 ms the cost is per-invocation (Mosaic entry/exit or
XLA<->custom-call transition), and the eval path's win is fewer, fatter
pallas_calls per chunk.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from mirror_nerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import functools

    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    REPS = 256
    DISPATCHES = 4

    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 1.000001 + 1e-6

    small = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec((8, 128), lambda: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )

    def kern_g(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 1.000001 + 1e-6

    grid = pl.pallas_call(
        kern_g, grid=(128,),
        in_specs=[pl.BlockSpec((1, 1, 4096), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, 4096), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((128, 1, 4096), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )

    xs = jnp.ones((8, 128), jnp.float32)
    xg = jnp.ones((128, 1, 4096), jnp.float32)

    @functools.partial(jax.jit, static_argnames=("mode",))
    def timed(xs, xg, mode: str):
        def body(i, acc):
            if mode == "xla_only":
                y = xs * (1.0 + acc * 1e-30 + i * 1e-9)
                return acc + y[0, 0]
            if mode == "pallas_min":
                y = small(xs + (acc * 1e-30 + i * 1e-9))
                return acc + y[0, 0]
            if mode == "pallas_two":
                y = small(xs + (acc * 1e-30 + i * 1e-9))
                y2 = small(y)
                return acc + y2[0, 0]
            y = grid(xg + (acc * 1e-30 + i * 1e-9))
            return acc + y[0, 0, 0]

        return lax.fori_loop(0, REPS, body, 0.0)

    for mode in ["xla_only", "pallas_min", "pallas_two", "pallas_grid"]:
        float(timed(xs, xg, mode))  # compile + warm
        best = float("inf")
        for _ in range(DISPATCHES):
            t0 = time.perf_counter()
            float(timed(xs, xg, mode))
            best = min(best, time.perf_counter() - t0)
        print(f"{mode:<12} {best / REPS * 1e6:9.2f} us/rep", flush=True)


if __name__ == "__main__":
    main()
