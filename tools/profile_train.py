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


def _profile_real_epoch(args):
    """One REAL reflection-stage epoch end-to-end (host sampling from the
    on-disk scene, compiled steps, val render, ckpt write), with the
    per-phase wall breakdown the Trainer now logs. The printed
    rays_per_sec is computed exactly like the training log's, so this
    number must reconcile with val_metrics.jsonl (VERDICT r4 #4)."""
    import time

    import numpy as np

    from mirror_nerf_tpu.config import Config
    from mirror_nerf_tpu.data.blender import BlenderDataset
    from mirror_nerf_tpu.parallel.mesh import get_mesh
    from mirror_nerf_tpu.train.checkpoints import save_train_ckpt
    from mirror_nerf_tpu.train.loop import Trainer, render_image_chunked
    from mirror_nerf_tpu.utils.cache import enable_compilation_cache

    import jax

    enable_compilation_cache()
    cfg = Config(
        root_dir=args.real_epoch, img_wh=(320, 240), near=0.05, far=12.0,
        bound=6.0, model_type=args.model if args.model != "nerf" else
        "nerf_tpu",
        N_samples=64, N_importance=64, batch_size=args.batch,
        num_epochs=20, predict_normal=True, predict_mirror_mask=True,
        trace_secondary_rays=True, train_geometry_stage=True,
        only_trace_rays_in_mirrors=True,
        use_plane_consistent_loss=True, lr=5e-4, chunk=8192,
        grid_lr_mult=20.0, adam_eps=1e-15,
        novel_ray_batch=512, novel_pose_jitter=0.2,
        novel_ray_loss_weight=3e-3, novel_ray_start_epoch=4,
        compute_dtype=args.compute_dtype,
        fp32_sigma_grad=args.fp32_sigma_grad,
        fused_train=args.fused_train,
        train_proposal_skip=args.train_proposal_skip,
        steps_per_dispatch=args.steps_per_dispatch,
    )
    ds = BlenderDataset(args.real_epoch, "train", cfg.img_wh, cfg)
    val = BlenderDataset(args.real_epoch, "val", cfg.img_wh, cfg)
    tr = Trainer(cfg, ds, "/tmp/profile_real_epoch", mesh=get_mesh(1))
    np_rng = np.random.default_rng(cfg.seed)
    epoch = 10  # reflection stage, all losses incl. novel-ray reg
    t0 = time.time()
    aux = tr.run_epoch(epoch, np_rng)
    wall = time.time() - t0
    n_rays = (len(ds.all_rays) // cfg.batch_size) * cfg.batch_size
    print(f"epoch wall {wall:.1f} s  ({n_rays / wall:,.0f} rays/s incl. "
          f"compile)")
    print(f"log-equivalent rays_per_sec: {aux['rays_per_sec']:,.0f} "
          f"(post-compile window {aux['epoch_wall_s']:.1f} s)")
    acc = {k[2:]: v for k, v in aux.items() if k.startswith("t_")}
    accounted = sum(acc.values())
    print("host-side breakdown of the post-compile window:")
    for k, v in sorted(acc.items(), key=lambda kv: -kv[1]):
        print(f"  {k:>9} {v:8.2f} s  {100 * v / aux['epoch_wall_s']:5.1f}%")
    print(f"  unaccounted (device-bound dispatch wait + python) "
          f"{aux['epoch_wall_s'] - accounted:8.2f} s")
    # the two per-epoch host costs outside run_epoch
    from mirror_nerf_tpu.train.loop import make_trace_settings

    t0 = time.time()
    fr = val.get_image(0)
    ts = make_trace_settings(cfg, epoch, False, is_eval=True)
    res = render_image_chunked(
        tr.field, tr.params, fr["rays"], fr["mirror_mask"],
        jax.random.PRNGKey(0), ts, chunk=cfg.chunk)
    jax.block_until_ready(res)
    print(f"val render (incl. compile): {time.time() - t0:.1f} s")
    t0 = time.time()
    res = render_image_chunked(
        tr.field, tr.params, fr["rays"], fr["mirror_mask"],
        jax.random.PRNGKey(1), ts, chunk=cfg.chunk)
    jax.block_until_ready(res)
    print(f"val render (steady): {time.time() - t0:.1f} s")
    t0 = time.time()
    save_train_ckpt("/tmp/profile_real_epoch/last.ckpt.npz",
                    jax.device_get(tr.params), jax.device_get(tr.opt_state),
                    tr.global_step, epoch + 1)
    print(f"ckpt write: {time.time() - t0:.1f} s")


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
    p.add_argument("--real_epoch", type=str, default="",
                   help="path to a real scene (e.g. scenes/dense96): run ONE "
                        "full reflection-stage epoch through Trainer.run_epoch "
                        "on real data and print the host/device wall breakdown "
                        "(gather / device_put / dispatch / sync) plus val "
                        "render and ckpt write — the reconciliation for the "
                        "microbench-vs-training-log rate gap (VERDICT r4 #4)")
    p.add_argument("--steps_per_dispatch", type=int, default=0)
    # production training runs compact_frac 1.0 (the mirror-heavy protocol
    # hazard, config.py); the microbench's historical 0.25 default renders
    # secondary bundles at quarter capacity — a ~1.6x cheaper program than
    # the real train step (the round-4 microbench-vs-wall-rate discrepancy,
    # VERDICT r4 #4 — resolved round 5)
    p.add_argument("--compact_frac", type=float, default=1.0)
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
        only_trace_rays_in_mirrors=True, compact_frac=args.compact_frac,
        smooth_mirror_start_epoch=0, train_mirror_mask_start_epoch=0,
        train_normal_start_epoch=0, use_plane_consistent_loss=True,
        lr=5e-4, compute_dtype=args.compute_dtype,
        fp32_sigma_grad=args.fp32_sigma_grad,
        fused_train=args.fused_train,
        train_proposal_skip=args.train_proposal_skip,
    )
    if args.real_epoch:
        return _profile_real_epoch(args)

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
