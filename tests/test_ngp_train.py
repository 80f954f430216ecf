"""NGP (hash-grid) model: end-to-end training on the procedural scene."""

import numpy as np
import pytest

from mirror_nerf_tpu.config import Config
from mirror_nerf_tpu.data.blender import BlenderDataset
from mirror_nerf_tpu.data.synthetic import generate_scene
from mirror_nerf_tpu.parallel.mesh import get_mesh
from mirror_nerf_tpu.train.loop import Trainer


@pytest.mark.slow
def test_ngp_two_stage_training_learns(tmp_path):
    root = str(tmp_path / "scene")
    generate_scene(root, n_train=4, n_val=1, n_test=1, img_wh=(24, 24))
    cfg = Config(
        root_dir=root, img_wh=(24, 24), near=0.05, far=12.0, bound=3.0,
        model_type="nerf_tcnn", N_samples=8, N_importance=8, batch_size=128,
        num_epochs=2, predict_normal=True, predict_mirror_mask=True,
        trace_secondary_rays=True, train_geometry_stage=True,
        train_geometry_stage_end_epoch=1, only_trace_rays_in_mirrors=True,
        smooth_mirror_start_epoch=0, train_mirror_mask_start_epoch=0,
        train_normal_start_epoch=0, lr=5e-3, decay_step=(2, 4, 8),
        decay_gamma=0.5, use_plane_consistent_loss=True,
        log2_hashmap_size=13,  # small table: 8 replicated copies must fit
    )
    ds = BlenderDataset(root, "train", cfg.img_wh, cfg)
    trainer = Trainer(cfg, ds, str(tmp_path / "run"), mesh=get_mesh(1))
    rng = np.random.default_rng(0)
    out0 = trainer.run_epoch(0, rng)
    out1 = trainer.run_epoch(1, rng)
    assert np.isfinite(out1["loss"])
    assert out1["psnr"] > out0["psnr"] - 0.5  # learning, not diverging
    assert out1["psnr"] > 10.0
