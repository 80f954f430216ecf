"""End-to-end: generate a procedural mirror scene, train both stages, verify
learning happens, checkpoints round-trip, and the val render runs."""

import os

import jax
import numpy as np
import pytest

from mirror_nerf_tpu.config import Config
from mirror_nerf_tpu.data.blender import BlenderDataset
from mirror_nerf_tpu.data.synthetic import generate_scene
from mirror_nerf_tpu.parallel.mesh import get_mesh
from mirror_nerf_tpu.train.checkpoints import load_train_ckpt, save_train_ckpt
from mirror_nerf_tpu.train.loop import (Trainer, make_trace_settings,
                                        render_image_chunked)


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scene"))
    generate_scene(root, n_train=4, n_val=1, n_test=1, img_wh=(24, 24))
    return root


@pytest.fixture(scope="module")
def cfg(scene):
    return Config(
        root_dir=scene, img_wh=(24, 24), near=0.05, far=12.0, bound=6.0,
        N_samples=8, N_importance=8, batch_size=128, num_epochs=2,
        predict_normal=True, predict_mirror_mask=True,
        trace_secondary_rays=True, train_geometry_stage=True,
        train_geometry_stage_end_epoch=1, use_plane_consistent_loss=True,
        only_trace_rays_in_mirrors=True, smooth_mirror_start_epoch=0,
        train_mirror_mask_start_epoch=0, train_normal_start_epoch=0,
        lr=5e-4, decay_step=(2, 4, 8), decay_gamma=0.5, chunk=576,
    )


def test_dataset_loads(scene, cfg):
    ds = BlenderDataset(scene, "train", cfg.img_wh, cfg)
    assert ds.all_rays.shape == (4 * 24 * 24, 8)
    assert ds.all_rgbs.shape == (4 * 24 * 24, 3)
    # all frames have masks -> wmask buffers equal full buffers
    assert ds.rays_wmask.shape == ds.all_rays.shape
    m = ds.all_mirror_masks
    assert set(np.unique(m)).issubset({0.0, 1.0})
    assert 0.01 < m.mean() < 0.9  # the mirror is visible but not everything
    # ray directions unit-length
    np.testing.assert_allclose(
        np.linalg.norm(ds.all_rays[:, 3:6], axis=-1), 1.0, rtol=1e-5)


def test_dataset_invalid_mask_sentinel(scene, tmp_path, cfg):
    root2 = str(tmp_path / "scene2")
    generate_scene(root2, n_train=3, n_val=1, n_test=1, img_wh=(16, 16),
                   drop_mask_for_first_n=1)
    ds = BlenderDataset(root2, "train", (16, 16), cfg)
    assert (ds.all_mirror_masks < 0).any()
    # frame 0 lacks a mask -> excluded from the wmask (geometry) buffers
    assert len(ds.rays_wmask) == 2 * 16 * 16
    ds.train_geometry_stage = True
    rays, _, masks = ds.train_buffers()
    assert len(rays) == 2 * 16 * 16
    assert (masks >= 0).all()


@pytest.mark.slow
def test_two_stage_training_learns(scene, cfg, tmp_path):
    ds = BlenderDataset(scene, "train", cfg.img_wh, cfg)
    trainer = Trainer(cfg, ds, str(tmp_path / "run"), mesh=get_mesh())
    rng = np.random.default_rng(0)
    out0 = trainer.run_epoch(0, rng)  # geometry stage
    out1 = trainer.run_epoch(1, rng)  # full stage with tracing
    assert np.isfinite(out1["loss"])
    assert out1["psnr"] > out0["psnr"]
    assert out1["psnr"] > 12.0

    # checkpoint round-trip
    p = str(tmp_path / "ck.npz")
    save_train_ckpt(p, jax.device_get(trainer.params),
                    jax.device_get(trainer.opt_state), trainer.global_step, 2)
    params2, opt2, step2, epoch2 = load_train_ckpt(
        p, jax.device_get(trainer.params), jax.device_get(trainer.opt_state))
    assert step2 == trainer.global_step and epoch2 == 2
    a = jax.tree_util.tree_leaves(jax.device_get(trainer.params))[0]
    b = jax.tree_util.tree_leaves(params2)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # val render through the eval tracer
    val = BlenderDataset(scene, "val", cfg.img_wh, cfg)
    sample = val.get_image(0)
    ts = make_trace_settings(cfg, 1, False, is_eval=True)
    res = render_image_chunked(
        trainer.field, trainer.params, sample["rays"], sample["mirror_mask"],
        jax.random.PRNGKey(0), ts, chunk=cfg.chunk,
        keys=("rgb_fine", "rgb_fine_reflect", "depth_fine"),
    )
    assert res["rgb_fine"].shape == (24 * 24, 3)
    assert np.isfinite(res["rgb_fine"]).all()


def test_multichip_matches_single_device(scene, cfg, tmp_path):
    """SPMD over 8 virtual devices must equal the 1-device step numerically."""
    ds = BlenderDataset(scene, "train", cfg.img_wh, cfg)
    from mirror_nerf_tpu.parallel.mesh import batch_sharding
    from mirror_nerf_tpu.train.loop import EpochStatics

    rays, rgbs, masks = ds.train_buffers()
    losses = {}
    for n_dev in (1, 8):
        trainer = Trainer(cfg, ds, str(tmp_path / f"m{n_dev}"),
                          mesh=get_mesh(n_dev))
        step = trainer.get_step_fn(EpochStatics.of(cfg, 1, False))
        bsh = batch_sharding(trainer.mesh)
        batch = {
            "rays": jax.device_put(rays[:cfg.batch_size], bsh),
            "rgbs": jax.device_put(rgbs[:cfg.batch_size], bsh),
            "mirror_mask": jax.device_put(masks[:cfg.batch_size], bsh),
        }
        params, _, aux = step(trainer.params, trainer.opt_state, batch,
                              jax.random.PRNGKey(0))
        losses[n_dev] = (float(aux["loss"]),
                         float(jax.tree_util.tree_leaves(params)[0].sum()))
    np.testing.assert_allclose(losses[1][0], losses[8][0], rtol=1e-4)
    np.testing.assert_allclose(losses[1][1], losses[8][1], rtol=1e-4)


def test_multichip_step_runs_on_virtual_mesh(scene, cfg, tmp_path):
    """The sharded train step must compile and run on all 8 virtual devices."""
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    ds = BlenderDataset(scene, "train", cfg.img_wh, cfg)
    mesh = get_mesh(8)
    trainer = Trainer(cfg, ds, str(tmp_path / "run8"), mesh=mesh)
    from mirror_nerf_tpu.train.loop import EpochStatics

    statics = EpochStatics.of(cfg, 1, False)
    step = trainer.get_step_fn(statics)
    from mirror_nerf_tpu.parallel.mesh import batch_sharding

    bsh = batch_sharding(mesh)
    rays, rgbs, masks = ds.train_buffers()
    batch = {
        "rays": jax.device_put(rays[:cfg.batch_size], bsh),
        "rgbs": jax.device_put(rgbs[:cfg.batch_size], bsh),
        "mirror_mask": jax.device_put(masks[:cfg.batch_size], bsh),
    }
    params, opt, aux = step(trainer.params, trainer.opt_state, batch,
                            jax.random.PRNGKey(0))
    assert np.isfinite(float(aux["loss"]))
    # params replicated on every device
    leaf = jax.tree_util.tree_leaves(params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_sharded_eval_render_matches_single_device(scene, cfg):
    """render_image_chunked over an 8-device mesh == single-device pixels."""
    from mirror_nerf_tpu.models.fields import MirrorNeRFField
    from mirror_nerf_tpu.render.renderer import RenderSettings
    from mirror_nerf_tpu.render.tracer import TraceSettings

    field = MirrorNeRFField(N_emb_xyz=4, N_emb_dir=2, depth=3, width=32,
                            skips=(1,))
    params = {"coarse": field.init(jax.random.PRNGKey(0)),
              "fine": field.init(jax.random.PRNGKey(1))}
    val = BlenderDataset(scene, "val", cfg.img_wh, cfg)
    sample = val.get_image(0)
    rs = RenderSettings(N_samples=8, N_importance=8, perturb=0.0,
                        noise_std=0.0, compute_normal=False, test_time=True)
    ts = TraceSettings(render=rs, trace_secondary_rays=True,
                       max_recursive_level=1, only_trace_mode="eval",
                       is_eval=False)
    kwargs = dict(rng=jax.random.PRNGKey(0), ts=ts, chunk=192,
                  keys=("rgb_fine",))
    single = render_image_chunked(field, params, sample["rays"],
                                  sample["mirror_mask"], **kwargs)
    sharded = render_image_chunked(field, params, sample["rays"],
                                   sample["mirror_mask"], mesh=get_mesh(8),
                                   **kwargs)
    np.testing.assert_allclose(sharded["rgb_fine"], single["rgb_fine"],
                               atol=1e-5)


class TestNonStrictLoading:
    """--prefixes_to_ignore / partial-ckpt semantics (ref utils/__init__.py:126-136)."""

    def _save(self, tmp_path, tree, name="w.npz"):
        from mirror_nerf_tpu.train.checkpoints import save_pytree

        p = str(tmp_path / name)
        save_pytree(p, tree)
        return p

    def test_missing_and_extra_keys(self, tmp_path):
        import numpy as np

        from mirror_nerf_tpu.train.checkpoints import load_pytree_nonstrict

        ckpt = {"coarse": {"w": np.ones((2, 2))},
                "extra_head": {"w": np.ones((3,))}}
        path = self._save(tmp_path, ckpt)
        like = {"coarse": {"w": np.zeros((2, 2))},
                "fine": {"w": np.zeros((2, 2))}}
        out = load_pytree_nonstrict(path, like)
        assert np.all(out["coarse"]["w"] == 1.0)  # loaded
        assert np.all(out["fine"]["w"] == 0.0)    # kept from init

    def test_prefix_ignored(self, tmp_path):
        import numpy as np

        from mirror_nerf_tpu.train.checkpoints import load_pytree_nonstrict

        ckpt = {"coarse": {"w": np.ones((2, 2))},
                "loss": {"scale": np.ones((1,))}}
        path = self._save(tmp_path, ckpt)
        like = {"coarse": {"w": np.zeros((2, 2))},
                "loss": {"scale": np.zeros((1,))}}
        out = load_pytree_nonstrict(path, like, prefixes_to_ignore=("loss",))
        assert np.all(out["coarse"]["w"] == 1.0)
        assert np.all(out["loss"]["scale"] == 0.0)  # ignored prefix

    def test_shape_mismatch_keeps_init(self, tmp_path):
        import numpy as np

        from mirror_nerf_tpu.train.checkpoints import load_pytree_nonstrict

        path = self._save(tmp_path, {"w": np.ones((4, 4))})
        out = load_pytree_nonstrict(path, {"w": np.zeros((2, 2))},
                                    prefixes_to_ignore=())
        assert np.all(out["w"] == 0.0)

    def test_train_ckpt_params_prefix(self, tmp_path):
        import numpy as np

        from mirror_nerf_tpu.train.checkpoints import (load_pytree_nonstrict,
                                                       save_train_ckpt)

        params = {"coarse": {"w": np.full((2, 2), 3.0)}}
        p = str(tmp_path / "t.npz")
        save_train_ckpt(p, params, {"mu": np.zeros((2, 2))}, step=5, epoch=1)
        out = load_pytree_nonstrict(p, {"coarse": {"w": np.zeros((2, 2))}})
        assert np.all(out["coarse"]["w"] == 3.0)

    def test_no_overlap_raises(self, tmp_path):
        import numpy as np
        import pytest

        from mirror_nerf_tpu.train.checkpoints import load_pytree_nonstrict

        path = self._save(tmp_path, {"a": np.ones((2,))})
        with pytest.raises(KeyError):
            load_pytree_nonstrict(path, {"b": np.zeros((2,))})


@pytest.mark.slow
def test_two_epoch_trajectory_matches_across_mesh_sizes(scene, tmp_path):
    """VERDICT r2 #8: a 2-epoch run (geometry -> reflection stage flip,
    same batches, psum grads) must produce the same loss trajectory and
    final params on 1 vs 8 virtual devices."""
    cfg = Config(
        root_dir=scene, img_wh=(24, 24), near=0.05, far=12.0, bound=6.0,
        N_samples=6, N_importance=6, batch_size=128, num_epochs=2,
        predict_normal=True, predict_mirror_mask=True,
        trace_secondary_rays=True, train_geometry_stage=True,
        train_geometry_stage_end_epoch=1, use_plane_consistent_loss=True,
        only_trace_rays_in_mirrors=True, smooth_mirror_start_epoch=0,
        train_mirror_mask_start_epoch=0, train_normal_start_epoch=0,
        lr=5e-4, decay_step=(2, 4, 8), decay_gamma=0.5, chunk=576,
        steps_per_dispatch=1,
    )
    out = {}
    for n_dev in (1, 8):
        ds = BlenderDataset(scene, "train", cfg.img_wh, cfg)
        trainer = Trainer(cfg, ds, str(tmp_path / f"traj{n_dev}"),
                          mesh=get_mesh(n_dev))
        rng = np.random.default_rng(123)
        a0 = trainer.run_epoch(0, rng)  # geometry stage
        a1 = trainer.run_epoch(1, rng)  # reflection stage
        out[n_dev] = (a0["loss"], a1["loss"],
                      jax.device_get(trainer.params))
    # Tolerances: the single-step test above pins psum-grad math at
    # rtol 1e-4; across ~36 Adam steps XLA:CPU fp noise compounds (the
    # optimizer's per-step sign normalization amplifies ULP differences —
    # see tests/test_multi_step.py), so the 2-epoch check asserts the
    # trajectories stay within ~1%, not bitwise equality.
    np.testing.assert_allclose(out[1][0], out[8][0], rtol=2e-4)
    np.testing.assert_allclose(out[1][1], out[8][1], rtol=2e-2)
    l1 = jax.tree_util.tree_leaves(out[1][2])
    l8 = jax.tree_util.tree_leaves(out[8][2])
    # per-param drift bound: Adam moves each param by ~±lr per step, so a
    # handful of noise-flipped steps shifts near-zero params by a few
    # multiples of lr. A tiny fraction of params (<0.1%, measured ~0.04%
    # on XLA:CPU) sits exactly at a ReLU/sort decision boundary and takes
    # a genuinely different path — bound the drifted FRACTION and the
    # worst-case magnitude instead of requiring every element inside atol.
    a_all = np.concatenate([np.asarray(a).ravel() for a in l1])
    b_all = np.concatenate([np.asarray(b).ravel() for b in l8])
    diff = np.abs(a_all - b_all)
    tol = 25 * cfg.lr + 5e-2 * np.abs(b_all)
    frac = float(np.mean(diff > tol))
    assert frac < 1e-3, f"{frac:.2%} of params drifted past the Adam bound"
    assert float(diff.max()) < 200 * cfg.lr, float(diff.max())


def test_weak_scaling_throughput_shape(scene, tmp_path):
    """Weak scaling: hold the PER-DEVICE batch constant and grow the mesh —
    the global batch grows n_dev-fold, an epoch takes n_dev-fold fewer
    optimizer steps over the same ray pool, and each device holds exactly
    its per-device slice of every batch (VERDICT r3 #7)."""
    from mirror_nerf_tpu.parallel.mesh import batch_sharding
    from mirror_nerf_tpu.train.loop import EpochStatics

    per_device = 64
    shapes = {}
    for n_dev in (1, 8):
        cfg = Config(
            root_dir=scene, img_wh=(24, 24), near=0.05, far=12.0, bound=6.0,
            N_samples=6, N_importance=6, batch_size=per_device * n_dev,
            num_epochs=1, predict_normal=True, predict_mirror_mask=True,
            trace_secondary_rays=True, lr=5e-4, chunk=576,
            steps_per_dispatch=1,
        )
        ds = BlenderDataset(scene, "train", cfg.img_wh, cfg)
        mesh = get_mesh(n_dev)
        trainer = Trainer(cfg, ds, str(tmp_path / f"weak{n_dev}"), mesh=mesh)
        rays, rgbs, masks = ds.train_buffers()
        bsh = batch_sharding(mesh)
        batch = {
            "rays": jax.device_put(rays[:cfg.batch_size], bsh),
            "rgbs": jax.device_put(rgbs[:cfg.batch_size], bsh),
            "mirror_mask": jax.device_put(masks[:cfg.batch_size], bsh),
        }
        # every device holds exactly the per-device slice
        for shard in batch["rays"].addressable_shards:
            assert shard.data.shape[0] == per_device
        step = trainer.get_step_fn(EpochStatics.of(cfg, 0, False))
        _, _, aux = step(trainer.params, trainer.opt_state, batch,
                         jax.random.PRNGKey(0))
        assert np.isfinite(float(aux["loss"]))
        shapes[n_dev] = trainer.steps_per_epoch

    # same ray pool -> 8x global batch means 8x fewer steps per epoch
    assert shapes[1] == 8 * shapes[8] or (
        # integer floor: allow off-by-rounding when n_rays % batch != 0
        abs(shapes[1] - 8 * shapes[8]) <= 8), shapes


def test_host_local_batch_single_process_matches_shard_batch(scene):
    """host_local_batch degrades to shard_batch in single-process runs."""
    from mirror_nerf_tpu.parallel.mesh import host_local_batch, shard_batch

    mesh = get_mesh(8)
    x = {"a": np.arange(64, dtype=np.float32).reshape(16, 4)}
    a = host_local_batch(mesh, x)
    b = shard_batch(mesh, x)
    np.testing.assert_array_equal(np.asarray(a["a"]), np.asarray(b["a"]))
    assert a["a"].sharding == b["a"].sharding


def test_trainer_applies_ref_steps_per_epoch(scene):
    """Trainer rescales epoch-indexed knobs to the dataset's actual
    steps-per-epoch when --ref_steps_per_epoch is set (round 5)."""
    base = Config(
        root_dir=scene, img_wh=(24, 24), near=0.05, far=12.0, bound=6.0,
        N_samples=8, N_importance=8, batch_size=128, num_epochs=10,
        decay_step=(4, 8), train_geometry_stage=True,
        train_geometry_stage_end_epoch=2,
        predict_normal=True, predict_mirror_mask=True,
        trace_secondary_rays=True,
    )
    ds = BlenderDataset(scene, "train", base.img_wh, base)
    steps = len(ds.all_rays) // base.batch_size
    tr = Trainer(base.replace(ref_steps_per_epoch=steps * 2), ds,
                 "/tmp/refsteps_test", mesh=get_mesh())
    assert tr.cfg.num_epochs == 20
    assert tr.cfg.decay_step == (8, 16)
    assert tr.cfg.train_geometry_stage_end_epoch == 4
    # unset -> untouched
    tr2 = Trainer(base, ds, "/tmp/refsteps_test2", mesh=get_mesh())
    assert tr2.cfg.num_epochs == 10
