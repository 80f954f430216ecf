"""Config CLI surface, LR schedules, visualization panels."""

import numpy as np
import pytest

from mirror_nerf_tpu.config import Config, get_opts
from mirror_nerf_tpu.train.optim import make_lr_schedule


class TestConfigCLI:
    def test_reference_train_invocation_parses(self):
        # the exact flag set the reference run.sh MODE 0 passes (run.sh:259-280)
        argv = (
            "--dataset_name blender --root_dir /tmp/x --near 0.05 --far 8.0 "
            "--scale_factor 6 --N_importance 64 --img_wh 400 300 --noise_std 1 "
            "--num_epochs 30 --batch_size 1024 --optimizer adam --lr 5e-4 "
            "--lr_scheduler steplr --decay_step 2 4 8 --decay_gamma 0.5 "
            "--exp_name e --bound 6 --model_type nerf --predict_normal "
            "--predict_mirror_mask --trace_secondary_rays "
            "--train_geometry_stage --use_plane_consistent_loss --val_idx 0 "
            "--train_skip_step 1 --chunk 8192 --only_trace_rays_in_mirrors"
        ).split()
        cfg = get_opts(argv)
        assert cfg.img_wh == (400, 300)
        assert cfg.decay_step == (2, 4, 8)
        assert cfg.trace_secondary_rays and cfg.train_geometry_stage
        assert cfg.chunk == 8192 and cfg.bound == 6.0
        assert isinstance(hash(cfg), int)  # hashable -> jit-static

    def test_defaults_match_reference(self):
        d = Config()
        assert d.N_emb_xyz == 10 and d.N_emb_dir == 4
        assert d.N_samples == 64 and d.N_importance == 128
        assert d.lr == 5e-4 and d.batch_size == 1024
        assert d.train_geometry_stage_end_epoch == 4
        assert d.smooth_mirror_start_epoch == 2
        assert d.train_mirror_mask_start_epoch == 2
        assert d.train_normal_start_epoch == 1
        assert d.normal_loss_weight == 1e-4
        assert d.mirror_mask_loss_weight == 0.1


class TestSchedules:
    def _cfg(self, **kw):
        base = dict(lr=1.0, lr_scheduler="steplr", decay_step=(2, 4, 8),
                    decay_gamma=0.5, num_epochs=10, warmup_epochs=0)
        base.update(kw)
        return Config(**base)

    def test_steplr_milestones(self):
        sched = make_lr_schedule(self._cfg(), steps_per_epoch=10)
        assert float(sched(0)) == 1.0
        assert float(sched(19)) == 1.0  # epoch 1
        assert float(sched(20)) == 0.5  # epoch 2
        assert float(sched(40)) == 0.25  # epoch 4
        assert float(sched(80)) == 0.125  # epoch 8
        assert float(sched(99)) == 0.125

    def test_poly(self):
        sched = make_lr_schedule(self._cfg(lr_scheduler="poly", poly_exp=1.0),
                                 steps_per_epoch=1)
        np.testing.assert_allclose(float(sched(5)), 0.5, rtol=1e-6)

    def test_cosine_endpoints(self):
        sched = make_lr_schedule(self._cfg(lr_scheduler="cosine"),
                                 steps_per_epoch=1)
        assert float(sched(0)) == pytest.approx(1.0, abs=1e-6)
        assert float(sched(10)) == pytest.approx(0.0, abs=1e-6)

    def test_warmup(self):
        sched = make_lr_schedule(
            self._cfg(warmup_epochs=2, warmup_multiplier=2.0),
            steps_per_epoch=10)
        # ramps from lr/multiplier up, then hands over to steplr
        assert float(sched(0)) == pytest.approx(0.5, abs=1e-6)
        assert float(sched(30)) == 0.5  # epoch 3: steplr after milestone 2


class TestVisualization:
    def test_panel_grid(self):
        import jax
        import jax.numpy as jnp

        from mirror_nerf_tpu.utils.visualization import visualize_val_image

        H = W = 8
        n = H * W
        key = jax.random.PRNGKey(0)
        batch = {
            "rgbs": jax.random.uniform(key, (n, 3)),
            "mirror_mask": jnp.zeros((n,)),
        }
        results = {
            "rgb_fine": jax.random.uniform(key, (n, 3)),
            "rgb_coarse": jax.random.uniform(key, (n, 3)),
            "depth_fine": jax.random.uniform(key, (n,)) * 3,
            "mirror_mask_fine": jax.random.uniform(key, (n,)),
            "surface_normal_fine": jax.random.normal(key, (n, 3)),
            "x_surface_fine": jax.random.normal(key, (n, 3)),
        }
        grid = visualize_val_image((W, H), batch, results)
        assert grid.ndim == 3 and grid.shape[2] == 3
        assert grid.shape[0] % H == 0 and grid.shape[1] == W * 4
        assert np.isfinite(grid).all()
        assert grid.min() >= 0 and grid.max() <= 1
