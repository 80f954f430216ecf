#!/usr/bin/env python
"""Measure steady-state TRAIN-step throughput on the attached TPU.

Times the real compiled train step (Trainer._build_step — reflection stage,
all losses, 1-level Whitted trace, grad-of-grad σ-normals; reference train
config run.sh:259-280) on synthetic ray batches, then times a K-steps-per-
dispatch `lax.scan` variant of the same math to isolate per-dispatch tunnel
latency (measured at ~30-40 ms/dispatch on this attachment — see
BASELINE.md methodology notes).

Usage: python tools/profile_train.py [--model nerf_tpu] [--batch 1024]
         [--steps 16] [--scan_k 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class _FakeDataset:
    """Just enough dataset surface for Trainer: random rays/rgbs/masks."""

    def __init__(self, n: int, rng: "np.random.Generator"):
        import numpy as np

        o = rng.normal(size=(n, 3)).astype(np.float32)
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        near = np.full((n, 1), 0.05, np.float32)
        far = np.full((n, 1), 8.0, np.float32)
        self.all_rays = np.concatenate([o, d, near, far], -1)
        self.all_rgbs = rng.uniform(size=(n, 3)).astype(np.float32)
        self.all_mirror_masks = (
            rng.uniform(size=(n,)) < 0.2).astype(np.float32)
        self.train_geometry_stage = False

    def train_buffers(self):
        return self.all_rays, self.all_rgbs, self.all_mirror_masks

    def __len__(self):
        return len(self.all_rays)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", choices=["nerf", "nerf_tcnn", "nerf_tpu"],
                   default="nerf")
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--steps", type=int, default=16)
    p.add_argument("--scan_k", type=int, default=8,
                   help="steps per dispatch for the scan variant (0=skip)")
    p.add_argument("--geometry", action="store_true",
                   help="profile the geometry-stage step (no trace)")
    p.add_argument("--epoch", type=int, default=-1,
                   help="epoch for the statics schedule (default: 10, or 0 "
                        "with --geometry; geometry epochs >= 2 add the "
                        "mask/plane losses)")
    p.add_argument("--compute_dtype", type=str, default="float32")
    p.add_argument("--fp32_sigma_grad", action="store_true")
    p.add_argument("--train_proposal_skip", action="store_true",
                   help="single-pass training (no coarse proposal)")
    p.add_argument("--fused_train", type=str, default="auto",
                   choices=["auto", "on", "off"])
    p.add_argument("--trace_out", type=str, default="",
                   help="if set, capture a profiler trace of 2 steps here")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mirror_nerf_tpu.config import Config
    from mirror_nerf_tpu.parallel.mesh import get_mesh
    from mirror_nerf_tpu.train.loop import EpochStatics, Trainer
    from mirror_nerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    cfg = Config(
        root_dir="/tmp", img_wh=(8, 8), near=0.05, far=8.0, bound=6.0,
        model_type=args.model,
        N_samples=64, N_importance=64, batch_size=args.batch,
        num_epochs=1, predict_normal=True, predict_mirror_mask=True,
        trace_secondary_rays=True, train_geometry_stage=False,
        only_trace_rays_in_mirrors=True, compact_frac=0.25,
        smooth_mirror_start_epoch=0, train_mirror_mask_start_epoch=0,
        train_normal_start_epoch=0, use_plane_consistent_loss=True,
        lr=5e-4, compute_dtype=args.compute_dtype,
        fp32_sigma_grad=args.fp32_sigma_grad,
        fused_train=args.fused_train,
        train_proposal_skip=args.train_proposal_skip,
    )
    rng = np.random.default_rng(0)
    ds = _FakeDataset(args.batch * 4, rng)
    tr = Trainer(cfg, ds, "/tmp/profile_train", mesh=get_mesh(1))
    epoch = args.epoch if args.epoch >= 0 else (0 if args.geometry else 10)
    statics = EpochStatics.of(cfg, epoch, args.geometry)
    step = tr.get_step_fn(statics)

    def make_batch(i):
        idx = rng.integers(0, len(ds), size=args.batch)
        return {
            "rays": jnp.asarray(ds.all_rays[idx]),
            "rgbs": jnp.asarray(ds.all_rgbs[idx]),
            "mirror_mask": jnp.asarray(ds.all_mirror_masks[idx]),
        }

    batches = [make_batch(i) for i in range(args.steps)]
    params, opt_state = tr.params, tr.opt_state
    key = jax.random.PRNGKey(0)

    # warm/compile
    t0 = time.perf_counter()
    params, opt_state, aux = step(params, opt_state, batches[0], key)
    float(aux["loss"])
    print(f"compile+first step: {time.perf_counter() - t0:.1f} s")

    for rep in range(3):
        t0 = time.perf_counter()
        for i in range(args.steps):
            params, opt_state, aux = step(
                params, opt_state, batches[i],
                jax.random.fold_in(key, i))
        float(aux["loss"])  # fetch = the only reliable sync here
        dt = time.perf_counter() - t0
        print(f"per-step dispatch: {args.steps} steps in {dt:.3f} s -> "
              f"{args.steps * args.batch / dt:,.0f} rays/s "
              f"({dt / args.steps * 1e3:.1f} ms/step)")

    if args.scan_k > 1:
        k = args.scan_k
        stacked = {
            kk: jnp.stack([b[kk] for b in batches[:k]]) for kk in batches[0]
        }
        keys = jax.random.split(key, k)

        if hasattr(tr, "get_multi_step_fn"):
            mstep = tr.get_multi_step_fn(statics, k)
            t0 = time.perf_counter()
            params, opt_state, aux = mstep(params, opt_state, stacked, keys)
            jax.tree_util.tree_map(
                lambda x: np.asarray(x), aux)
            print(f"scan compile+first: {time.perf_counter() - t0:.1f} s")
            n_disp = max(args.steps // k, 1)
            for rep in range(3):
                t0 = time.perf_counter()
                for i in range(n_disp):
                    params, opt_state, aux = mstep(
                        params, opt_state, stacked, keys)
                float(aux["loss"])
                dt = time.perf_counter() - t0
                tot = n_disp * k * args.batch
                print(f"scan-{k} dispatch: {n_disp} dispatches in {dt:.3f} s"
                      f" -> {tot / dt:,.0f} rays/s")
        else:
            print("Trainer.get_multi_step_fn not available; skipping scan")

    if args.trace_out:
        import collections
        import glob
        import gzip
        import json

        n_tr = 4
        os.makedirs(args.trace_out, exist_ok=True)
        with jax.profiler.trace(args.trace_out):
            for i in range(n_tr):
                params, opt_state, aux = step(
                    params, opt_state, batches[i], jax.random.fold_in(key, i))
            float(aux["loss"])
        tr = sorted(glob.glob(f"{args.trace_out}/**/*.trace.json.gz",
                              recursive=True))[-1]
        data = json.load(gzip.open(tr))
        pids = {}
        tids = {}
        for e in data.get("traceEvents", []):
            if e.get("ph") == "M" and e.get("name") == "process_name":
                pids[e["pid"]] = e["args"].get("name", "")
            if e.get("ph") == "M" and e.get("name") == "thread_name":
                tids[(e["pid"], e["tid"])] = e["args"].get("name", "")
        dev_pids = {p for p, n in pids.items() if "TPU" in n}
        # Only the "XLA Ops" track is op-level device time; the "Steps" and
        # "XLA Modules" tracks are umbrella spans (counting them inflated
        # "device busy" ~3x and surfaced step numbers as phantom ops).
        op_keys = {k for k, n in tids.items()
                   if k[0] in dev_pids and "XLA Ops" in n}
        agg = collections.Counter()
        ops = collections.Counter()
        for e in data.get("traceEvents", []):
            if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in op_keys:
                full = e["name"]
                name = full.split(".")[0][:55]
                if name.startswith("jit_"):
                    continue  # parent span; children carry op-level time
                agg[name] += e.get("dur", 0)
                ops[full[:70]] += e.get("dur", 0)
        total = sum(agg.values())
        print(f"device busy: {total / 1e3:.1f} ms / {n_tr} steps "
              f"({total / 1e3 / n_tr:.1f} ms/step, batch {args.batch})")
        for name, dur in agg.most_common(15):
            print(f"  {dur / 1e3:8.2f} ms {100 * dur / max(total, 1):5.1f}%  "
                  f"{name}")
        print("top individual ops:")
        for name, dur in ops.most_common(25):
            print(f"  {dur / 1e3:8.2f} ms {100 * dur / max(total, 1):5.1f}%  "
                  f"{name}")
        print(f"trace: {tr}")


if __name__ == "__main__":
    main()
