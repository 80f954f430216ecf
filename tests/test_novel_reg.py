"""Novel-ray (jittered-origin) distortion regularization.

The floater failure mode: density parked in space no train ray traverses is
invisible to every train-ray loss (STATUS.md item 7). These tests pin that
the novel-ray prior (a) actually penalizes such density, (b) leaves a clean
field nearly untouched, and (c) runs inside a real train step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mirror_nerf_tpu.models.fields import MirrorNeRFField
from mirror_nerf_tpu.train.losses import (distortion_core,
                                          novel_ray_regularization)


def test_distortion_core_prefers_concentrated_weights():
    z = jnp.linspace(0.1, 4.0, 32)[None, :].repeat(4, 0)
    sharp = jnp.zeros((4, 32)).at[:, 16].set(0.9)
    fog = jnp.full((4, 32), 0.9 / 32)
    assert float(distortion_core(fog, z)) > 10 * float(
        distortion_core(sharp, z))


class _FloaterField(MirrorNeRFField):
    """σ = gaussian blob at `center` scaled by params["amp"]."""

    def density(self, params, xyz):
        d2 = jnp.sum((xyz - jnp.asarray([1.0, 0.0, 1.0])) ** 2, -1)
        sigma = params["amp"] * jnp.exp(-d2 / 0.1)
        return sigma, jnp.zeros((xyz.shape[0], 1))


def test_novel_rays_see_offset_floater():
    """Rays along +z at x=0 miss the blob at x=1; jittered origins hit it,
    and the gradient pushes its amplitude DOWN."""
    field = _FloaterField(predict_normal=False, predict_mirror_mask=False)
    n = 256
    o = jnp.zeros((n, 3))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    rays = jnp.concatenate(
        [o, d, jnp.full((n, 1), 0.05), jnp.full((n, 1), 4.0)], -1)
    params = {"coarse": {"amp": jnp.float32(5.0)}}

    def reg(amp, jitter, key):
        p = {"coarse": {"amp": amp}}
        return novel_ray_regularization(field, p, rays, key, 64, jitter)

    key = jax.random.PRNGKey(0)
    # unjittered rays never see the blob: no gradient on its amplitude
    g0 = jax.grad(reg)(jnp.float32(5.0), 0.0, key)
    assert abs(float(g0)) < 1e-6
    # jittered origins sweep x=1: the blob is seen and penalized
    g1 = jax.grad(reg)(jnp.float32(5.0), 0.6, key)
    assert float(g1) > 1e-4


@pytest.mark.slow
def test_train_step_with_novel_reg(tmp_path):
    from mirror_nerf_tpu.config import Config
    from mirror_nerf_tpu.data.synthetic import generate_scene
    from mirror_nerf_tpu.data.blender import BlenderDataset
    from mirror_nerf_tpu.train.loop import Trainer

    root = str(tmp_path / "scene")
    generate_scene(root, n_train=2, n_val=1, n_test=1, img_wh=(16, 16))
    cfg = Config(
        root_dir=root, dataset_name="blender", img_wh=(16, 16),
        N_samples=8, N_importance=8, batch_size=64, num_epochs=1,
        near=0.05, far=12.0, chunk=128, predict_normal=True,
        predict_mirror_mask=True, trace_secondary_rays=False,
        train_geometry_stage=False, novel_ray_batch=32,
        novel_ray_loss_weight=1e-2, exp_name="t")
    ds = BlenderDataset(root, "train", (16, 16), cfg)
    tr = Trainer(cfg, ds, str(tmp_path / "log"))
    aux = tr.run_epoch(0, np.random.default_rng(0))
    assert "novel_ray_reg" in aux
    assert np.isfinite(aux["novel_ray_reg"])
    assert np.isfinite(aux["loss"])
