#!/usr/bin/env python
"""Probe: does the v5e MXU run int8 matmuls at 2x bf16 through Mosaic?

The CP encoder's table matmuls are ~52% of the fused kernel and already at
~84% of bf16 peak (BASELINE.md stage budget) — the only way through that
wall at fixed FLOPs is a faster unit. v5e advertises 394 TOPS int8 vs
197 TFLOP/s bf16. If an in-kernel int8 `dot` actually lowers and doubles
throughput, an int8-quantized-table eval mode (per-level scales; hat basis
quantized to 8-bit fractions) becomes the next encoder lever.

Methodology: encoder-shaped work — per grid block, build a (G, L) basis in
VMEM from a (1, L) input row (1-pass, matching the "const_basis" ablation;
HBM traffic is just the row), then K table matmuls (R, G) @ (G, L) with
VMEM-resident tables, like the real 3-axes x 3-levels loop. REPS dispatches
are chained inside one jit via fori_loop (per-dispatch tunnel latency is
~40 ms — see exp_cp_ablate.py).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--g", type=int, default=512)
    p.add_argument("--r", type=int, default=64)
    p.add_argument("--lanes", type=int, default=1024)
    p.add_argument("--blocks", type=int, default=64)
    p.add_argument("--tables", type=int, default=9)
    p.add_argument("--reps", type=int, default=64)
    p.add_argument("--dispatches", type=int, default=3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g, r, lanes, nb, nt = args.g, args.r, args.lanes, args.blocks, args.tables

    def make_timed(name):
        def kernel(x_ref, t_ref, o_ref):
            x = x_ref[0]  # (1, L) fp32
            iot = lax.broadcasted_iota(jnp.int32, (g, lanes), 0)
            acc = jnp.zeros((r, lanes), jnp.float32)
            for j in range(nt):
                basis_f = iot.astype(jnp.float32) * 1e-3 + x + jnp.float32(j)
                if name == "int8":
                    basis = jnp.clip(basis_f, -127, 127).astype(jnp.int8)
                    o = lax.dot_general(
                        t_ref[j], basis, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    acc = acc + o.astype(jnp.float32)
                else:
                    basis = basis_f.astype(jnp.bfloat16)
                    o = lax.dot_general(
                        t_ref[j], basis, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    acc = acc + o
            o_ref[0] = acc

        dt = jnp.int8 if name == "int8" else jnp.bfloat16

        @jax.jit
        def call(x, t):
            return pl.pallas_call(
                kernel,
                grid=(nb,),
                in_specs=[
                    pl.BlockSpec((1, 1, lanes), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((nt, r, g), lambda i: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, r, lanes), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((nb, r, lanes), jnp.float32),
            )(x, t)

        @jax.jit
        def timed(x, t):
            def body(i, acc):
                out = call(x + acc * 1e-30 + i * 1e-7, t)
                return acc + out[0, 0, 0]

            return lax.fori_loop(0, args.reps, body, jnp.float32(0.0))

        return timed, dt

    k = jax.random.PRNGKey(0)
    x = jax.random.uniform(k, (nb, 1, lanes), jnp.float32)
    flops = 2.0 * nb * nt * r * g * lanes

    for name in ("bf16", "int8"):
        timed, dt = make_timed(name)
        if name == "int8":
            t = jax.random.randint(k, (nt, r, g), -127, 127, jnp.int8)
        else:
            t = jax.random.normal(k, (nt, r, g), jnp.float32).astype(dt)
        try:
            float(timed(x, t))  # compile + warm
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED to compile/run: {str(e)[:300]}")
            continue
        best = float("inf")
        for _ in range(args.dispatches):
            t0 = time.perf_counter()
            float(timed(x, t))
            best = min(best, time.perf_counter() - t0)
        s = best / args.reps
        unit = "TOP/s" if name == "int8" else "TFLOP/s"
        print(f"{name}: {s * 1e3:7.3f} ms/rep  {flops / s / 1e12:7.1f} {unit}",
              flush=True)


if __name__ == "__main__":
    main()
