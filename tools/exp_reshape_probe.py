#!/usr/bin/env python
"""Probe: does Mosaic lower an in-kernel (1, L) <-> (L//128, 128) reshape?

If yes, the composite machinery (δ roll + segmented prefix scan + weight
exps — all (1, L) rows at 1/8 sublane utilization) can run in a
(rows, 128) layout instead: 8× fewer vregs per elementwise op, and the
per-ray exclusive prefix becomes ONE (rows, 128) @ TRI(128, 128) matmul
(vs ceil(log2 s) masked cross-vreg lane rotations). The two layouts have
identical row-major linear order, so the reshape is a pure relayout.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L = 4096
S = 128
ROWS = L // S


def _tri_excl(s: int, width: int = 128):
    """Block-diagonal strictly-lower-triangular (width, width):
    TRI[j, i] = 1 if j < i and same s-segment. (w = x @ TRI computes
    w[:, i] = sum_{j<i} x[:, j] per segment.)"""
    j = np.arange(width)[:, None]
    i = np.arange(width)[None, :]
    return ((j < i) & (j // s == i // s)).astype(np.float32)


def kernel_reshape(x_ref, tri_ref, o_ref):
    x = x_ref[0]  # (1, L)
    x32 = x.reshape(ROWS, 128)
    cum = jax.lax.dot_general(
        x32, tri_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = cum.reshape(1, L)


def main():
    x = jnp.asarray(np.random.RandomState(0).rand(8, 1, L), jnp.float32)
    tri = jnp.asarray(_tri_excl(S), jnp.float32)
    try:
        fn = pl.pallas_call(
            kernel_reshape,
            grid=(8,),
            in_specs=[pl.BlockSpec((1, 1, L), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((S, S), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1, L), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 1, L), jnp.float32),
        )
    except Exception as e:
        # spec/pytree-level error: the probe itself is broken, not Mosaic
        print(f"RESHAPE-IN-KERNEL: PROBE ERROR (bad specs, not a lowering "
              f"verdict)\n{type(e).__name__}: {e}")
        raise
    try:
        out = fn(x, tri)
        out.block_until_ready()
    except Exception as e:
        print(f"RESHAPE-IN-KERNEL: FAILED\n{type(e).__name__}: {e}")
        sys.exit(1)
    # oracle: per-segment exclusive prefix
    xs = np.asarray(x).reshape(8, -1, S)
    want = np.cumsum(xs, axis=-1) - xs
    got = np.asarray(out).reshape(8, -1, S)
    err = np.abs(got - want).max()
    print(f"RESHAPE-IN-KERNEL: OK  max|err|={err:.3e}")


if __name__ == "__main__":
    main()
