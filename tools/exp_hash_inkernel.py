#!/usr/bin/env python
"""In-kernel hash-grid attempt (VERDICT r2 #5): measure, then integrate or
close the question.

The nerf_tcnn path renders at ~5k rays/s because the hash encoder is 128
row-gathers per sample (16 levels x 8 corners) and XLA `take` sustains only
~66 M rows/s at 2^19 rows (BASELINE.md microbenches). The reference fused
exactly this on GPU (`gridencoder.cu:91-272`) using per-thread loads +
atomicAdd. This probe measures the TPU-native candidates:

  A. xla_take       — baseline: one fused take for all levels' corners.
  B. scalar_loop    — Pallas kernel, 2 MB bf16 table VMEM-resident, per-row
                      scalar loop (SMEM indices -> dynamic-slice row loads).
                      The only mechanism Mosaic offers for arbitrary random
                      access; `tpu.dynamic_gather` is vreg-limited (compiles
                      only within 8 sublanes, see BASELINE.md).
  C. dense_matmul   — Pallas kernel for DENSE levels only: trilinear interp
                      over a tensor-product grid is separable, so the lookup
                      becomes one MXU matmul (hat_x @ T2) + per-axis VPU
                      contractions. Exact (parity-checked); only applies to
                      levels with side^3 <= 2^19 (levels 0-3 at bound 6 —
                      4 of 16; the xor hash of finer levels destroys
                      separability).

Run on TPU for the timing table; on CPU it runs parity checks in interpret
mode. Integration call: B must beat ~8x over A for a fused hybrid to reach
the VERDICT's >=10x bar (dense levels are only 32/128 of the gathers).
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# ---------------------------------------------------------------- case A


def xla_take_all(table, idx):
    """idx (N, K) int32 -> (N, K, C) via one fused gather."""
    return table[idx]


# ---------------------------------------------------------------- case B

LANES = 512
CORNERS = 8


def _scalar_loop_kernel(idx_ref, flat_ref, out_ref):
    """idx (SMEM, (1, 1, CORNERS*LANES)); flat (R*C/128, 128) VMEM — the
    (R, C=2) table packed FLAT into natural 128-lane VMEM rows (a (R, 2)
    VMEM tensor is lane-padded 64x: 2 MB becomes 128 MB); out
    (CORNERS*LANES, C) VMEM.

    Two Mosaic constraints shape this kernel — they ARE the measurement:
    * no scalar-gather path: an arbitrary dynamic row load fails with
      `cannot statically prove that index in dimension 0 is a multiple
      of 8` — dynamic VMEM slices must be sublane-aligned, so each gather
      loads the aligned (8, 128) block containing its 2 values;
    * the row/lane of the value are then selected with iota masks and a
      full-block reduction — ~2k VPU element-ops per 2-value gather.
    """
    n = idx_ref.shape[-1]
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

    def body(k8, _):
        rows = []
        for j in range(8):
            i = idx_ref[0, 0, k8 * 8 + j]
            f = i * 2                       # flat offset of channel 0
            r = f // 128                    # VMEM row
            l = f % 128                     # lane of channel 0 (even)
            blk = flat_ref[pl.ds((r // 8) * 8, 8), :].astype(jnp.float32)
            m = (sub == (r % 8))
            c0 = jnp.sum(jnp.where(m & (lane == l), blk, 0.0))
            c1 = jnp.sum(jnp.where(m & (lane == l + 1), blk, 0.0))
            rows.append(jnp.stack([c0, c1])[None, :])
        out_ref[0, pl.ds(k8 * 8, 8), :] = jnp.concatenate(
            rows, axis=0).astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n // 8, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def scalar_loop_gather(table, idx, interpret=False):
    """table (R, C=2); idx (NB, CORNERS*LANES) -> (NB, CORNERS*LANES, C)."""
    nb, n = idx.shape
    r, c = table.shape
    assert c == 2 and (r * c) % 128 == 0
    flat = table.reshape(r * c // 128, 128)
    idx = idx.reshape(nb, 1, n)
    return pl.pallas_call(
        _scalar_loop_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(flat.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, n, c), table.dtype),
        interpret=interpret,
    )(idx, flat)


# ---------------------------------------------------------------- case C

PSIDE = 64  # padded side; dense levels at bound 6 have side 17/26/40/62


def _hat_rows(x01_col, scale, pside, dtype):
    """(S, 1) coords in [0,1] -> hat basis (S, pside) against the level's
    grid: pos = x*scale + 0.5 (align_corners False; scale is the level's
    FLOAT 2^(lS)*H - 1, not an integer), hat over integer j."""
    pos = x01_col * scale + 0.5
    # tpu.iota is integer-only on hardware — build int32 and convert
    j = jax.lax.broadcasted_iota(
        jnp.int32, (x01_col.shape[0], pside), 1).astype(jnp.float32)
    u = pos - j
    return jnp.maximum(0.0, 1.0 - jnp.abs(u)).astype(dtype)


def _dense_matmul_kernel(scale, x_ref, t2_ref, out_ref):
    """x (3, S) coords in [0,1]; t2 (PSIDE, PSIDE*2*PSIDE) reordered level
    table T2[x, y*128 + c*64 + z]; out (S, 2)."""
    s = x_ref.shape[-1]
    bf = t2_ref.dtype
    x = x_ref[0]  # (3, S)
    hx = _hat_rows(x[0, :][:, None], scale, PSIDE, bf)   # (S, 64)
    hy = _hat_rows(x[1, :][:, None], scale, PSIDE, bf)
    hz = _hat_rows(x[2, :][:, None], scale, PSIDE, jnp.float32)
    e1 = jax.lax.dot_general(hx, t2_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (S, 8192)
    acc = jnp.zeros((s, 2 * PSIDE), jnp.float32)
    for j in range(PSIDE):
        acc = acc + hy[:, j:j + 1].astype(jnp.float32) * e1[:, j * 128:
                                                            (j + 1) * 128]
    f0 = jnp.sum(hz * acc[:, :PSIDE], axis=-1, keepdims=True)
    f1 = jnp.sum(hz * acc[:, PSIDE:], axis=-1, keepdims=True)
    out_ref[0] = jnp.concatenate([f0, f1], axis=-1)


def reorder_level_table(flat_level, side):
    """(size, 2) flat rows (index = x + y*side + z*side^2, CUDA stride
    order) -> (PSIDE, PSIDE*2*PSIDE) T2[x, y*128 + c*64 + z], zero-padded."""
    t = np.zeros((PSIDE, PSIDE, 2, PSIDE), np.float32)
    g = np.asarray(flat_level[: side ** 3]).reshape(side, side, side, 2)
    # g[z, y, x] (index = x + y*side + z*side^2)
    t[: side, : side, :, : side] = np.moveaxis(g, (2, 1, 3, 0), (0, 1, 2, 3))
    return t.reshape(PSIDE, PSIDE * 2 * PSIDE)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def dense_matmul_lookup(t2, x01, scale, interpret=False):
    """t2 (PSIDE, PSIDE*2*PSIDE); x01 (NB, 3, S) -> (NB, S, 2)."""
    nb, _, s = x01.shape
    return pl.pallas_call(
        functools.partial(_dense_matmul_kernel, scale),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 3, s), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(t2.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s, 2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, s, 2), jnp.float32),
        interpret=interpret,
    )(x01.reshape(nb, 3, s), t2)


# ---------------------------------------------------------------- parity


def check_parity():
    from mirror_nerf_tpu.ops.hashgrid import (HashGridSpec, hashgrid_encode,
                                              init_hashgrid)

    interpret = jax.default_backend() != "tpu"
    rng = np.random.RandomState(0)

    # B: scalar-loop gather == take
    r, c = 4096, 2
    table = jnp.asarray(rng.randn(r, c), jnp.float32)
    idx = jnp.asarray(rng.randint(0, r, (2, CORNERS * LANES)), jnp.int32)
    got = scalar_loop_gather(table, idx, interpret=interpret)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(table[idx]))
    print("parity B (scalar-loop gather): OK")

    # C: dense separable matmul == hashgrid_encode on a single dense level
    spec = HashGridSpec(input_dim=3, num_levels=4, level_dim=2,
                        base_resolution=16,
                        per_level_scale=float(np.exp2(np.log2(2048 * 6 / 16)
                                                      / 15)))
    lv = spec.levels()[3]
    side = lv.resolution + 1
    assert not lv.use_hash and side <= PSIDE, (side, lv.use_hash)
    full = init_hashgrid(jax.random.PRNGKey(0), spec)
    full = full + jnp.asarray(rng.randn(*full.shape), jnp.float32) * 0.1
    x01 = jnp.asarray(rng.rand(LANES, 3), jnp.float32)
    ref = hashgrid_encode(full, x01, spec)[:, 6:8]  # level 3's features
    t2 = jnp.asarray(reorder_level_table(
        np.asarray(full[lv.offset: lv.offset + lv.size]), side))
    got = dense_matmul_lookup(t2, x01.T[None], float(lv.scale),
                              interpret=interpret)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-6, rtol=1e-5)
    print(f"parity C (dense separable, side {side}): OK")


# ---------------------------------------------------------------- timing


REPS = 32


def _timeit_loop(make_body, init, reps=REPS):
    """In-dispatch timing (the exp_cp_ablate lesson: on this attachment only
    a value FETCH synchronizes — block_until_ready returns at enqueue, so
    per-dispatch harnesses time NOTHING). make_body(k, acc) -> acc must make
    each rep's work depend on k and fold a value into acc, so nothing is
    CSE'd or dead; one scalar fetch at the end synchronizes the chain."""

    @jax.jit
    def run():
        return jax.lax.fori_loop(0, reps, make_body, init)

    float(jnp.sum(run()))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(run()))
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def bench():
    rng = np.random.RandomState(1)
    r = 2 ** 19
    nb = 64  # 64 * 4096 = 262144 rows per call
    n_rows = nb * CORNERS * LANES

    table16 = jnp.asarray(rng.randn(r, 2), jnp.bfloat16)
    table32 = table16.astype(jnp.float32)
    idx2 = jnp.asarray(rng.randint(0, r - 1, (nb, CORNERS * LANES)),
                       jnp.int32)

    def body_a(k, acc):
        out = xla_take_all(table32, (idx2 + (k & 1)).reshape(-1, CORNERS))
        return acc + out.reshape(-1)[0]

    t = _timeit_loop(body_a, jnp.float32(0))
    print(f"A xla_take      : {n_rows / t / 1e6:8.1f} M rows/s "
          f"({t * 1e3:.3f} ms / {n_rows} rows)")

    def body_b(k, acc):
        out = scalar_loop_gather(table16, idx2 + (k & 1), interpret=False)
        return acc + out.reshape(-1)[0].astype(jnp.float32)

    t = _timeit_loop(body_b, jnp.float32(0))
    print(f"B scalar_loop   : {n_rows / t / 1e6:8.1f} M rows/s "
          f"({t * 1e3:.3f} ms)")

    t2 = jnp.asarray(rng.randn(PSIDE, PSIDE * 2 * PSIDE), jnp.bfloat16)
    x01 = jnp.asarray(rng.rand(nb * CORNERS, 3, LANES), jnp.float32)
    n_samp = nb * CORNERS * LANES  # samples; each = 8 fused corner-rows

    def body_c(k, acc):
        out = dense_matmul_lookup(t2, x01 + k.astype(jnp.float32) * 1e-6,
                                  scale=59.43, interpret=False)
        return acc + out.reshape(-1)[0]

    t = _timeit_loop(body_c, jnp.float32(0))
    print(f"C dense_matmul  : {n_samp / t / 1e6:8.1f} M samples/s = "
          f"{n_samp * 8 / t / 1e6:8.1f} M rows-equil/s ({t * 1e3:.3f} ms)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip_parity", action="store_true")
    ap.add_argument("--skip_bench", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (interpret-mode parity)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    print("backend:", jax.default_backend())
    if not args.skip_parity:
        check_parity()
    if not args.skip_bench and jax.default_backend() == "tpu":
        bench()
