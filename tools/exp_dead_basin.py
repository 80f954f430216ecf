#!/usr/bin/env python
"""Probe the epoch-0 ReLU-death basin: two-pass vs single-pass vs softplus.

Round-4 finding (BASELINE.md): with the champion recipe (grid_lr_mult 20,
eps 1e-15, noise_std 1) the geometry-stage blackout drives σ_raw below the
ReLU dead region. In the two-pass run only the COARSE tower dies (the fine
pass survives and trains to 36 dB); in `--train_proposal_skip` mode the ONLY
field is exposed to the same dynamics — held-out collapsed to 12.2 dB with
constant depth (fog) and memorized reflections (sweeps/results_r4.jsonl,
single_pass_champion).

This probe trains a few hundred REAL geometry-stage steps on the dense-ring
scene for three arms and reports the batch-PSNR trend plus the σ_raw
distribution over a probe grid — distinguishing "optimization basin"
(single-pass σ dives dead while the two-pass fine survives) from "bug in the
single-pass path" (both behave alike).

Usage: python tools/exp_dead_basin.py [--steps 300] [--batch 512] [--cpu]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_arm(name, cfg, ds, steps, probe_xyz):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mirror_nerf_tpu.parallel.mesh import get_mesh
    from mirror_nerf_tpu.train.loop import EpochStatics, Trainer

    tr = Trainer(cfg, ds, f"/tmp/dead_basin_{name}", mesh=get_mesh(1))
    statics = EpochStatics.of(cfg, 0, True)  # epoch-0 geometry stage
    step = tr.get_step_fn(statics)
    rays, rgbs, masks = ds.train_buffers()
    # geometry-stage blackout (train.py:410-416 analog) is applied inside
    # the step via statics; feed raw buffers
    rng = np.random.default_rng(0)
    params, opt_state = tr.params, tr.opt_state
    key = jax.random.PRNGKey(0)
    psnrs = []
    for i in range(steps):
        idx = rng.integers(0, len(rays), size=cfg.batch_size)
        batch = {"rays": jnp.asarray(rays[idx]),
                 "rgbs": jnp.asarray(rgbs[idx]),
                 "mirror_mask": jnp.asarray(masks[idx])}
        params, opt_state, aux = step(params, opt_state, batch,
                                      jax.random.fold_in(key, i))
        if (i + 1) % 50 == 0:
            psnrs.append(round(float(aux["psnr"]), 2))
    # σ_raw over the probe grid, per field
    field = tr.field
    stats = {}
    for typ in ("coarse", "fine"):
        if typ not in params:
            continue
        sig, _ = field.density(params[typ], probe_xyz)
        sig = np.asarray(sig)
        stats[typ] = dict(mean=float(sig.mean()),
                          frac_dead=float((sig < -3).mean()),
                          frac_pos=float((sig > 0).mean()))
    print(f"[{name}] psnr@50-step marks: {psnrs}")
    for typ, s in stats.items():
        print(f"[{name}] sigma_raw {typ}: mean {s['mean']:+.2f}  "
              f"frac<-3 {s['frac_dead']:.2f}  frac>0 {s['frac_pos']:.2f}")
    return psnrs, stats


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--root_dir", default="scenes/dense96")
    args = ap.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import numpy as np

    from mirror_nerf_tpu.config import Config
    from mirror_nerf_tpu.data.blender import BlenderDataset

    base = dict(
        root_dir=args.root_dir, dataset_name="blender", img_wh=(320, 240),
        near=0.05, far=12.0, bound=6.0, scale_factor=1.0,
        model_type="nerf_tpu", N_samples=64, N_importance=64,
        batch_size=args.batch, num_epochs=20, predict_normal=True,
        predict_mirror_mask=True, trace_secondary_rays=True,
        train_geometry_stage=True, only_trace_rays_in_mirrors=True,
        use_plane_consistent_loss=True, noise_std=1.0, lr=5e-4,
        grid_lr_mult=20.0, adam_eps=1e-15,
    )
    cfgs = {
        "two_pass": Config(**base),
        "single_pass": Config(**base, train_proposal_skip=True),
        "single_pass_softplus": Config(**base, train_proposal_skip=True,
                                       sigma_activation="softplus"),
    }
    c0 = Config(**base)
    ds = BlenderDataset(c0.root_dir, split="train", img_wh=c0.img_wh, cfg=c0)
    rng = np.random.default_rng(1)
    probe_xyz = rng.uniform(-6, 6, size=(4096, 3)).astype(np.float32)
    import jax.numpy as jnp

    probe_xyz = jnp.asarray(probe_xyz)
    for name, cfg in cfgs.items():
        run_arm(name, cfg, ds, args.steps, probe_xyz)


if __name__ == "__main__":
    main()
