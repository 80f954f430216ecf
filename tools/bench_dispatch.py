#!/usr/bin/env python
"""Dispatch/sync microbenchmark for this TPU attachment.

Quantifies the costs that motivated bench.py's timing methodology
(BASELINE.md): per-execute dispatch latency for dependent chains of tiny
programs, the cost of a value fetch, and the penalty of serializing large
renders through a data dependence. Run solo.

Usage: python tools/bench_dispatch.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def step(x):
        return x + 1.0

    x = jnp.zeros((8, 128))
    x = step(x)
    float(jnp.sum(x))  # warm

    n = 50
    t0 = time.perf_counter()
    for _ in range(n):
        x = step(x)
    float(jnp.sum(x))
    print(f"dependent chain (tiny): {(time.perf_counter()-t0)/n*1e3:.2f} "
          f"ms/execute")

    t0 = time.perf_counter()
    for _ in range(10):
        float(jnp.sum(x))
    print(f"value fetch: {(time.perf_counter()-t0)/10*1e3:.2f} ms")

    y = jnp.zeros((4096, 1024))

    @jax.jit
    def step2(y):
        return y * 1.000001

    y = step2(y)
    float(jnp.sum(y))
    t0 = time.perf_counter()
    for _ in range(n):
        y = step2(y)
    float(jnp.sum(y))
    print(f"dependent chain (16MB op): "
          f"{(time.perf_counter()-t0)/n*1e3:.2f} ms/execute")


if __name__ == "__main__":
    main()
