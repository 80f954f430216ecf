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


class TestOptimizers:
    """Every optimizer x scheduler x warmup combo must actually step.

    Round-1 regression: `--optimizer ranger` crashed because optax.lookahead
    needs LookaheadParams while the Trainer passes a raw pytree.
    """

    @pytest.mark.parametrize("optimizer", ["sgd", "adam", "radam", "ranger"])
    @pytest.mark.parametrize("scheduler", ["steplr", "cosine", "poly"])
    @pytest.mark.parametrize("warmup", [0, 2])
    def test_one_real_update(self, optimizer, scheduler, warmup):
        import jax
        import jax.numpy as jnp

        from mirror_nerf_tpu.train.optim import make_optimizer

        cfg = Config(optimizer=optimizer, lr_scheduler=scheduler,
                     warmup_epochs=warmup, warmup_multiplier=2.0,
                     lr=1e-2, num_epochs=10, decay_step=(2, 4, 8),
                     decay_gamma=0.5, momentum=0.9, poly_exp=1.0)
        tx = make_optimizer(cfg, steps_per_epoch=10)
        params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state):
            grads = jax.tree.map(jnp.ones_like, params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return jax.tree.map(lambda p, u: p + u, params, updates), opt_state

        for _ in range(3):
            params, opt_state = step(params, opt_state)
        assert all(np.isfinite(np.asarray(v)).all() for v in params.values())
        assert not np.allclose(np.asarray(params["w"]), 1.0)

    def test_lookahead_sync_semantics(self):
        import jax.numpy as jnp
        import optax

        from mirror_nerf_tpu.train.optim import lookahead

        tx = lookahead(optax.sgd(0.1), sync_period=3, slow_step_size=0.5)
        params = {"w": jnp.array([1.0])}
        state = tx.init(params)
        slow0 = float(state["slow"]["w"][0])
        grads = {"w": jnp.array([1.0])}
        hist = []
        for _ in range(3):
            updates, state = tx.update(grads, state, params)
            params = optax.apply_updates(params, updates)
            hist.append(float(params["w"][0]))
        # steps 1-2: plain sgd (1.0 -> 0.9 -> 0.8); step 3 syncs:
        # fast would be 0.7, slow = 1.0 + 0.5*(0.7-1.0) = 0.85, fast reset to slow
        assert hist[0] == pytest.approx(0.9)
        assert hist[1] == pytest.approx(0.8)
        assert hist[2] == pytest.approx(slow0 + 0.5 * (0.7 - slow0))
        assert float(state["slow"]["w"][0]) == pytest.approx(hist[2])

    def test_grid_lr_mult_scales_only_grid_updates(self):
        """--grid_lr_mult multiplies the final step of every leaf under a
        'grid' dict key (at any nesting depth) and leaves the rest exact."""
        import jax
        import jax.numpy as jnp

        from mirror_nerf_tpu.train.optim import make_optimizer

        base = Config(optimizer="adam", lr=1e-3, num_epochs=4,
                      decay_step=(2,), decay_gamma=0.5)
        hot = Config(optimizer="adam", lr=1e-3, num_epochs=4,
                     decay_step=(2,), decay_gamma=0.5, grid_lr_mult=8.0)
        params = {"coarse": {"grid": {"axes": [jnp.ones((4, 2))]},
                             "sigma_net": [{"w": jnp.ones((2, 2))}]}}
        grads = jax.tree.map(lambda p: 0.5 * jnp.ones_like(p), params)
        outs = {}
        for name, cfg in (("base", base), ("hot", hot)):
            tx = make_optimizer(cfg, steps_per_epoch=10)
            st = tx.init(params)
            upd, _ = tx.update(grads, st, params)
            outs[name] = upd
        g_base = np.asarray(outs["base"]["coarse"]["grid"]["axes"][0])
        g_hot = np.asarray(outs["hot"]["coarse"]["grid"]["axes"][0])
        np.testing.assert_allclose(g_hot, 8.0 * g_base, rtol=1e-6)
        m_base = np.asarray(outs["base"]["coarse"]["sigma_net"][0]["w"])
        m_hot = np.asarray(outs["hot"]["coarse"]["sigma_net"][0]["w"])
        np.testing.assert_allclose(m_hot, m_base, rtol=0)

    def test_coarse_grid_lr_mult_splits_fields(self):
        """--coarse_grid_lr_mult gives the COARSE field's grid its own lr
        multiplier (round-4 dead-proposal fix) while the fine grid keeps
        grid_lr_mult and non-grid leaves stay exact."""
        import jax
        import jax.numpy as jnp

        from mirror_nerf_tpu.train.optim import make_optimizer

        base = Config(optimizer="adam", lr=1e-3, num_epochs=4,
                      decay_step=(2,), decay_gamma=0.5)
        split = Config(optimizer="adam", lr=1e-3, num_epochs=4,
                       decay_step=(2,), decay_gamma=0.5, grid_lr_mult=8.0,
                       coarse_grid_lr_mult=2.0)
        params = {
            "coarse": {"grid": {"axes": [jnp.ones((4, 2))]},
                       "sigma_net": [{"w": jnp.ones((2, 2))}]},
            "fine": {"grid": {"axes": [jnp.ones((4, 2))]}},
        }
        grads = jax.tree.map(lambda p: 0.5 * jnp.ones_like(p), params)
        outs = {}
        for name, cfg in (("base", base), ("split", split)):
            tx = make_optimizer(cfg, steps_per_epoch=10)
            upd, _ = tx.update(grads, tx.init(params), params)
            outs[name] = upd
        gc_b = np.asarray(outs["base"]["coarse"]["grid"]["axes"][0])
        gc_s = np.asarray(outs["split"]["coarse"]["grid"]["axes"][0])
        gf_b = np.asarray(outs["base"]["fine"]["grid"]["axes"][0])
        gf_s = np.asarray(outs["split"]["fine"]["grid"]["axes"][0])
        np.testing.assert_allclose(gc_s, 2.0 * gc_b, rtol=1e-6)
        np.testing.assert_allclose(gf_s, 8.0 * gf_b, rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(outs["split"]["coarse"]["sigma_net"][0]["w"]),
            np.asarray(outs["base"]["coarse"]["sigma_net"][0]["w"]), rtol=0)

    def test_adam_eps_flag_changes_update(self):
        import jax.numpy as jnp

        from mirror_nerf_tpu.train.optim import make_optimizer

        params = {"w": jnp.ones((4,))}
        grads = {"w": 1e-9 * jnp.ones((4,))}
        steps = {}
        for eps in (1e-8, 1e-15):
            cfg = Config(optimizer="adam", lr=1e-2, num_epochs=4,
                         decay_step=(2,), adam_eps=eps)
            tx = make_optimizer(cfg, steps_per_epoch=10)
            upd, _ = tx.update(grads, tx.init(params), params)
            steps[eps] = float(np.asarray(upd["w"])[0])
        # tiny grads: eps=1e-8 damps the normalized step, 1e-15 does not
        assert abs(steps[1e-15]) > 2 * abs(steps[1e-8])


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


def test_rescale_schedule_matches_hand_derivation():
    """--ref_steps_per_epoch (round 5): the dense96 champion recipe
    (7200 steps/epoch; 20 ep, decay 8/14/18, geometry end 4) rescaled for
    the paper400 ray pool (10986 steps/epoch) must land on the hand-derived
    step-equivalent arm that recovered +5.7 dB (BASELINE.md)."""
    from mirror_nerf_tpu.config import Config, rescale_schedule

    cfg = Config(num_epochs=20, decay_step=(8, 14, 18),
                 train_geometry_stage_end_epoch=4,
                 smooth_mirror_start_epoch=2,
                 train_mirror_mask_start_epoch=2,
                 train_normal_start_epoch=1, novel_ray_start_epoch=4,
                 ref_steps_per_epoch=7200)
    out = rescale_schedule(cfg, 10986)
    assert out.num_epochs == 13
    assert out.decay_step == (5, 9, 12)
    assert out.train_geometry_stage_end_epoch == 3
    assert out.novel_ray_start_epoch == 3
    assert out.smooth_mirror_start_epoch == 1
    assert out.train_normal_start_epoch == 1
    # no-op cases: flag unset, or dataset already at the reference
    assert rescale_schedule(cfg.replace(ref_steps_per_epoch=0), 10986) \
        == cfg.replace(ref_steps_per_epoch=0)
    assert rescale_schedule(cfg, 7200) == cfg
    # upscaling direction (training a SMALLER scene with the same recipe)
    up = rescale_schedule(cfg, 3600)
    assert up.num_epochs == 40 and up.decay_step == (16, 28, 36)
