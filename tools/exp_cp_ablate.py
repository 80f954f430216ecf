#!/usr/bin/env python
"""Decompose the CP fused kernel's device budget by stage ablation.

Prior ablations didn't add up: dropping the 512 table level (55% of FLOPs)
gained ~15% and sigma_only (dropping SH + 3 head nets + epilogue) ~11%, so
most of the time is somewhere else. This sweep times structurally ablated
kernels (CPFusedSpec.ablate — wrong numerics, same shapes, inputs kept
data-dependent so nothing constant-folds):

    io                    pallas_call overhead + I/O floor
    enc_only  (σ-only)    + basis build + table matmuls + rank product
    const_basis (σ-only)  encoder with a 1-pass basis (isolates basis VPU)
    const_feats (σ-only)  σ-net path without the encoder
    "" σ-only             encoder + σ-net
    "" full               everything (reference point)

--mode rays budgets the bench-default ray-input composite kernel instead
(fused_cp_forward_composite_rays): there "io" additionally includes the
in-kernel segment-expand, δ roll-difference, prefix scan and (full only)
the composite sum — i.e. it is the composite machinery floor, not a pure
I/O floor.

Timing methodology: on this TPU attachment per-dispatch tunnel latency is
~40 ms — larger than the kernel itself — so each measurement runs REPS
kernel invocations inside ONE jitted dispatch via lax.fori_loop (iterations
chained on a scalar so XLA cannot CSE or reorder them; the input is
perturbed by the loop index so the calls aren't identical), returning one
scalar. A first-pass naive version of this tool timed per-dispatch and
measured 47 Mpt/s for EVERY variant including the empty `io` kernel —
pure dispatch floor.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pts", type=int, default=1 << 19)
    p.add_argument("--reps", type=int, default=64)
    p.add_argument("--dispatches", type=int, default=3)
    p.add_argument("--lanes", type=int, nargs="+", default=[1024, 2048])
    p.add_argument("--basis", type=str, default="hat")
    p.add_argument("--mode", choices=["points", "rays"], default="points",
                   help="points: per-sample kernel (fused_cp_forward); "
                        "rays: the bench-default ray-input composite kernel "
                        "(fused_cp_forward_composite_rays, S=128/ray)")
    p.add_argument("--samples", type=int, default=128,
                   help="samples per ray (rays mode)")
    p.add_argument("--cases", type=str, default=None,
                   help="comma-separated ablate-case filter, e.g. "
                        "'io_min,io' (σ-only forms)")
    args = p.parse_args()

    from mirror_nerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from mirror_nerf_tpu.models.tpugrid import TPUGridField
    from mirror_nerf_tpu.ops.pallas.fused_cp import (
        CPFusedSpec, fused_cp_forward, fused_cp_forward_composite_rays,
        pack_cp_params)

    field = TPUGridField(bound=6.0, predict_normal=True,
                         predict_mirror_mask=True, compute_dtype="bfloat16")
    params = field.init(jax.random.PRNGKey(0))
    t = args.pts

    cases = [
        ("io", True), ("enc_only", True), ("const_basis", True),
        ("const_feats", True), ("", True), ("const_feats", False),
        ("", False),
    ]
    if args.mode == "rays":
        # decompose the composite-machinery floor
        cases = [("io_nowts", True), ("io_min", True), ("io_noexpand", True),
                 ("io_noscan", True)] + cases
    if args.cases is not None:
        want = set(args.cases.split(","))
        cases = [(a, s) for a, s in cases if (a or "full") in want]

    for lanes in args.lanes:
        nb = t // lanes
        k = jax.random.PRNGKey(1)
        x3 = jax.random.uniform(k, (nb, 3, lanes), jnp.float32)
        d3 = jax.random.normal(k, (nb, 3, lanes), jnp.float32)
        rpb = lanes // args.samples
        od = jax.random.uniform(k, (nb, 9, rpb), jnp.float32)
        z = jnp.broadcast_to(
            jnp.linspace(0.05, 6.0, args.samples, dtype=jnp.float32),
            (nb, rpb, args.samples)).reshape(nb, 1, lanes)
        base_ms = {}
        for ablate, sigma_only in cases:
            spec = CPFusedSpec(
                levels=tuple(field.grid_levels), sigma_only=sigma_only,
                lanes=lanes, basis=args.basis, ablate=ablate,
                samples=(args.samples if args.mode == "rays" else 0),
                ray_inputs=args.mode == "rays")
            packed = pack_cp_params(params, field, lanes=lanes,
                                    basis=args.basis)

            if args.mode == "rays":

                @jax.jit
                def timed(od, z, packed):
                    def body(i, acc):
                        pr, wts = fused_cp_forward_composite_rays(
                            packed, od + (acc * 1e-30 + i * 1e-7), z, spec)
                        return acc + wts[0, 0, 0]

                    return lax.fori_loop(0, args.reps, body, 0.0)

                timed_args = (od, z, packed)
            else:

                @jax.jit
                def timed(x3, d3, packed):
                    def body(i, acc):
                        out = fused_cp_forward(
                            packed, x3 + (acc * 1e-30 + i * 1e-7), d3, spec)
                        return acc + out[0, 0, 0]

                    return lax.fori_loop(0, args.reps, body, 0.0)

                timed_args = (x3, d3, packed)

            float(timed(*timed_args))  # compile + warm
            best = float("inf")
            for _ in range(args.dispatches):
                t0 = time.perf_counter()
                float(timed(*timed_args))  # value fetch = sync
                best = min(best, time.perf_counter() - t0)
            ms = best / args.reps * 1e3
            base_ms[(ablate, sigma_only)] = ms
            name = (ablate or "full") + ("/σ" if sigma_only else "")
            print(f"lanes={lanes} {name:<14} {ms:7.3f} ms "
                  f"{t / (ms * 1e-3) / 1e6:7.1f} Mpt/s", flush=True)
        budget_keys = (("io", True), ("enc_only", True), ("const_basis", True),
                       ("const_feats", True), ("", True), ("", False))
        if any(k not in base_ms for k in budget_keys):
            continue  # filtered run: no full budget line
        io = base_ms[("io", True)]
        enc = base_ms[("enc_only", True)]
        cb = base_ms[("const_basis", True)]
        cf = base_ms[("const_feats", True)]
        sig = base_ms[("", True)]
        full = base_ms[("", False)]
        print(f"lanes={lanes} BUDGET (ms): io {io:.3f} | encoder "
              f"{enc - io:.3f} (basis-build {sig - cb:.3f}) | σ-net "
              f"{sig - enc:.3f} (alone {cf - io:.3f}) | heads+SH+epi "
              f"{full - sig:.3f} | full {full:.3f}", flush=True)


if __name__ == "__main__":
    main()
