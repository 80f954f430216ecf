"""K-steps-per-dispatch training (Trainer._build_multi_step): the lax.scan
over K sequential optimizer steps computes the same math as K single-step
dispatches — same batches, same per-step rng keys.

Note on tolerances: on the TPU the two paths matched BITWISE over 2 Adam
steps; on XLA:CPU the scanned body and the standalone step compile to
different programs, giving ~1e-6-level gradient differences that the
training dynamics amplify ~3x per step (and Adam's ±lr sign normalization
amplifies to full steps). So the trajectory test runs 2 steps with SGD at
fp-noise tolerance, and a separate lr=0 full-epoch run checks the
batch/key plumbing (any mix-up would change the loss at O(1))."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mirror_nerf_tpu.config import Config
from mirror_nerf_tpu.data.blender import BlenderDataset
from mirror_nerf_tpu.data.synthetic import generate_scene
from mirror_nerf_tpu.parallel.mesh import get_mesh
from mirror_nerf_tpu.train.loop import EpochStatics, Trainer


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scene_ms"))
    generate_scene(root, n_train=2, n_val=1, n_test=1, img_wh=(16, 16))
    return root


def _cfg(scene, **kw):
    return Config(
        root_dir=scene, img_wh=(16, 16), near=0.05, far=12.0, bound=6.0,
        N_samples=8, N_importance=8, batch_size=64, num_epochs=1,
        predict_normal=True, predict_mirror_mask=True,
        trace_secondary_rays=True, train_geometry_stage=False,
        only_trace_rays_in_mirrors=True, smooth_mirror_start_epoch=0,
        train_mirror_mask_start_epoch=0, train_normal_start_epoch=0,
        use_plane_consistent_loss=True, chunk=256, exp_name="t", **kw)


@pytest.mark.slow
def test_scan_step_matches_single_step(scene, tmp_path):
    cfg = _cfg(scene, optimizer="sgd", momentum=0.9)
    ds = BlenderDataset(scene, "train", (16, 16), cfg)
    tr = Trainer(cfg, ds, str(tmp_path / "direct"), mesh=get_mesh(1))
    statics = EpochStatics.of(cfg, 10, False)
    step = tr.get_step_fn(statics)
    m2 = tr.get_multi_step_fn(statics, 2)

    rng = np.random.default_rng(0)
    idx = rng.integers(0, len(ds.all_rays), size=128)
    rays = ds.all_rays[idx].reshape(2, 64, 8)
    rgbs = ds.all_rgbs[idx].reshape(2, 64, 3)
    masks = ds.all_mirror_masks[idx].reshape(2, 64)
    keys = jnp.stack([jax.random.fold_in(jax.random.PRNGKey(0), j)
                      for j in range(2)])

    p0 = jax.device_get(tr.params)
    o0 = jax.device_get(tr.opt_state)

    p, o = jax.device_put(p0), jax.device_put(o0)
    for j in range(2):
        p, o, aux1 = step(p, o, {"rays": jnp.asarray(rays[j]),
                                 "rgbs": jnp.asarray(rgbs[j]),
                                 "mirror_mask": jnp.asarray(masks[j])},
                          keys[j])
    p_single = jax.device_get(p)

    p, o = jax.device_put(p0), jax.device_put(o0)
    p, o, aux2 = m2(p, o, {"rays": jnp.asarray(rays),
                           "rgbs": jnp.asarray(rgbs),
                           "mirror_mask": jnp.asarray(masks)}, keys)
    p_scan = jax.device_get(p)

    for a, b in zip(jax.tree_util.tree_leaves(p_single),
                    jax.tree_util.tree_leaves(p_scan)):
        np.testing.assert_allclose(a, b, atol=5e-5, rtol=5e-4)
    # the scan returns the LAST step's aux
    np.testing.assert_allclose(float(aux1["loss"]), float(aux2["loss"]),
                               rtol=1e-4)


@pytest.mark.slow
def test_epoch_plumbing_lr0(scene, tmp_path):
    # lr=0: params never move, so the final logged loss depends only on the
    # (batch, rng-key) sequence — identical between k=1 and k=3 (with the
    # 3+3+2 tail split) unless the multi-step path mis-plumbs batches/keys
    losses = {}
    steps = {}
    for k in (1, 3):
        cfg = _cfg(scene, optimizer="sgd", lr=0.0, steps_per_dispatch=k)
        ds = BlenderDataset(scene, "train", (16, 16), cfg)
        tr = Trainer(cfg, ds, str(tmp_path / f"lr0_k{k}"), mesh=get_mesh(1))
        aux = tr.run_epoch(0, np.random.default_rng(0))
        losses[k] = aux["loss"]
        steps[k] = tr.global_step
    assert steps[1] == steps[3] == 8
    np.testing.assert_allclose(losses[1], losses[3], rtol=1e-4)


@pytest.mark.slow
def test_multi_step_on_mesh(scene, tmp_path):
    # the scanned step composes with the sharded batch (8-device data mesh)
    cfg = _cfg(scene, steps_per_dispatch=4)
    ds = BlenderDataset(scene, "train", (16, 16), cfg)
    tr = Trainer(cfg, ds, str(tmp_path / "mesh"), mesh=get_mesh())
    aux = tr.run_epoch(0, np.random.default_rng(0))
    assert np.isfinite(aux["loss"])


def test_key_stack_matches_eager_fold_in(scene, tmp_path):
    """The one-dispatch key stack (round 4 host-overhead fix) is
    bitwise-identical to the eager per-key fold_in loop it replaced."""
    cfg = _cfg(scene, steps_per_dispatch=4)
    ds = BlenderDataset(scene, "train", (16, 16), cfg)
    tr = Trainer(cfg, ds, workdir=str(tmp_path), mesh=None)
    for s0 in (0, 1, 12345):
        tr.global_step = s0
        got = tr._key_stack_fn(4)(tr.base_key, jnp.int32(s0))
        want = jnp.stack([jax.random.fold_in(tr.base_key, s0 + j)
                          for j in range(4)])
        assert (np.asarray(got) == np.asarray(want)).all()
