#!/usr/bin/env python
"""Training entry point (reference-compatible CLI).

Mirrors the surface of reference `train.py:545-615` + `opt.py`: the same flag
names drive a staged training run with per-epoch checkpoints, validation
renders, and JSONL/TensorBoard metrics under `logs/{timestamp}_{exp_name}`.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def _snapshot_source(log_path: str) -> None:
    """Copy the framework source next to the run for reproducibility
    (parity with reference utils/__init__.py:147-171)."""
    import shutil

    repo = os.path.dirname(os.path.abspath(__file__))
    dst = os.path.join(log_path, "source_snapshot")
    try:
        shutil.copytree(
            os.path.join(repo, "mirror_nerf_tpu"),
            os.path.join(dst, "mirror_nerf_tpu"),
            ignore=shutil.ignore_patterns("__pycache__"))
        for f in ("train.py", "eval.py", "extract_color_mesh.py"):
            shutil.copy2(os.path.join(repo, f), dst)
    except OSError:
        pass  # snapshot is best-effort


def main(cfg=None):
    if cfg is None:
        from mirror_nerf_tpu.config import get_opts

        cfg = get_opts()

    from mirror_nerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from mirror_nerf_tpu.data import get_dataset
    from mirror_nerf_tpu.eval.metrics import psnr as psnr_metric
    from mirror_nerf_tpu.eval.metrics import ssim as ssim_metric
    from mirror_nerf_tpu.parallel.mesh import get_mesh
    from mirror_nerf_tpu.train.loop import (Trainer, make_trace_settings,
                                            render_image_chunked)
    from mirror_nerf_tpu.utils.visualization import (save_image,
                                                     visualize_val_image)

    exp_name = time.strftime("%Y%m%d-%H%M%S") + "_" + cfg.exp_name
    log_path = os.path.join("logs", exp_name)
    os.makedirs(log_path, exist_ok=True)
    print(f"Start with exp_name: {exp_name}.")
    with open(os.path.join(log_path, "config.json"), "w") as f:
        json.dump({k: str(v) for k, v in cfg.__dict__.items()}, f, indent=1)
    _snapshot_source(log_path)

    ds_cls = get_dataset(cfg.dataset_name)
    train_ds = ds_cls(cfg.root_dir, "train", cfg.img_wh, cfg)
    val_ds = ds_cls(cfg.root_dir, "val", cfg.img_wh, cfg)

    # --num_gpus maps to the number of mesh devices (reference CLI parity);
    # default uses every local device on the 1-D data axis
    mesh = get_mesh(cfg.num_gpus if cfg.num_gpus > 1 else None)
    trainer = Trainer(cfg, train_ds, log_path, mesh=mesh, val_dataset=val_ds)
    # the Trainer may rescale epoch-indexed schedule knobs
    # (--ref_steps_per_epoch, resolution-invariant recipes); everything
    # below (val-render settings, epoch loop) must see the effective cfg
    cfg = trainer.cfg

    tb = None
    try:
        from tensorboardX import SummaryWriter

        tb = SummaryWriter(log_path)
    except Exception:
        pass

    def on_epoch_end(tr, epoch, aux):
        # validation: render the fixed val image through the eval trace path
        sample = val_ds.get_image(0)
        geometry_stage = tr.stage_for_epoch(epoch)
        ts = make_trace_settings(cfg, epoch, geometry_stage, is_eval=True)
        res = render_image_chunked(
            tr.field, tr.params, sample["rays"], sample["mirror_mask"],
            jax.random.PRNGKey(cfg.seed + epoch), ts, chunk=cfg.chunk,
            mesh=mesh if cfg.num_gpus > 1 else None,
            keys=("rgb_fine", "rgb_coarse", "depth_fine", "depth_coarse",
                  "mirror_mask_fine", "mirror_mask_coarse",
                  "rgb_fine_reflect", "rgb_fine_direct",
                  "rgb_coarse_reflect", "rgb_coarse_direct",
                  "surface_normal_fine", "surface_normal_grad_fine",
                  "depth_fine_reflect", "depth_coarse_reflect",
                  "secondary_rays_o", "reflect_direction",
                  "x_surface_fine", "x_surface_coarse"),
        )
        typ = "fine" if "rgb_fine" in res else "coarse"
        rgbs = sample["rgbs"]
        if geometry_stage and (sample["mirror_mask"] >= 0).all() \
                and not cfg.woMaskRGBtoBlack:
            rgbs = np.where((sample["mirror_mask"] > 0.5)[:, None], 0.0, rgbs)
        val_psnr = psnr_metric(res[f"rgb_{typ}"], rgbs)
        # val SSIM alongside PSNR (reference logs both: metrics.py:14-23,
        # train.py:515-543)
        w_, h_ = cfg.img_wh
        val_ssim = ssim_metric(
            np.clip(res[f"rgb_{typ}"].reshape(h_, w_, 3), 0, 1),
            rgbs.reshape(h_, w_, 3))
        print(f"[epoch {epoch}] train_psnr={aux.get('psnr', float('nan')):.2f} "
              f"val_psnr={val_psnr:.2f} val_ssim={val_ssim:.4f} "
              f"rays/s={aux.get('rays_per_sec', 0):.0f}")
        grid = visualize_val_image(cfg.img_wh, sample, res)
        save_image(os.path.join(log_path, f"val_epoch{epoch}.png"), grid)
        record = {"epoch": epoch, "val_psnr": val_psnr,
                  "val_ssim": val_ssim, **aux}
        with open(os.path.join(log_path, "val_metrics.jsonl"), "a") as f:
            f.write(json.dumps(record) + "\n")
        if tb is not None:
            tb.add_scalar("val/psnr", val_psnr, tr.global_step)
            tb.add_scalar("val/ssim", val_ssim, tr.global_step)
            for k, v in aux.items():
                tb.add_scalar(f"train/{k}", v, tr.global_step)
            tb.add_image("val/panels", grid.transpose(2, 0, 1), tr.global_step)

    trainer.fit(on_epoch_end)
    return trainer


if __name__ == "__main__":
    main()
