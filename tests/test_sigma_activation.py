"""--sigma_activation softplus: the dead-region-free σ nonlinearity.

"relu" is the reference semantics (rendering.py:189-192); "softplus" is
the principled fix for the ReLU-death basin that freezes hot-lr CP-grid
coarse proposals in epoch 0 (BASELINE.md round 4). These tests pin:
  * the XLA compositing math against a numpy oracle,
  * fused-kernel (interpret) parity with the XLA path for both models,
  * an end-to-end train step training THROUGH the softplus compositing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mirror_nerf_tpu.config import Config, get_opts
from mirror_nerf_tpu.render.renderer import (RenderSettings,
                                             _composite_weights,
                                             render_rays, sigma_activation)


def test_composite_weights_softplus_oracle():
    rng = np.random.default_rng(0)
    n, s = 4, 8
    sig = rng.normal(size=(n, s)).astype(np.float32) * 3
    z = np.sort(rng.uniform(0.1, 2.0, size=(n, s)).astype(np.float32), -1)
    got = np.asarray(_composite_weights(jnp.asarray(sig), jnp.asarray(z),
                                        jnp.zeros((n, s)), "softplus"))
    deltas = np.concatenate([z[:, 1:] - z[:, :-1],
                             np.full((n, 1), 1e10, np.float32)], -1)
    dens = np.log1p(np.exp(-np.abs(sig))) + np.maximum(sig, 0.0)
    alphas = 1.0 - np.exp(-deltas * dens)
    trans = np.cumprod(
        np.concatenate([np.ones((n, 1)), 1 - alphas + 1e-10], -1)[:, :-1], -1)
    np.testing.assert_allclose(got, alphas * trans, rtol=1e-5, atol=1e-6)


def test_sigma_activation_relu_default_unchanged():
    sig = jnp.asarray([[-2.0, 0.0, 3.0]])
    np.testing.assert_allclose(np.asarray(sigma_activation(sig, "relu")),
                               [[0.0, 0.0, 3.0]])
    sp = np.asarray(sigma_activation(sig, "softplus"))
    assert (sp > 0).all() and abs(sp[0, 2] - 3.0487) < 1e-3


@pytest.fixture(scope="module")
def cp_setup():
    from mirror_nerf_tpu.models.tpugrid import TPUGridField

    field = TPUGridField(bound=2.0, predict_normal=True,
                         predict_mirror_mask=True,
                         grid_levels=((16, 8), (32, 8)))
    params = field.init(jax.random.PRNGKey(0))
    n, s = 6, 16
    ko, kd, kz = jax.random.split(jax.random.PRNGKey(1), 3)
    o = jax.random.normal(ko, (n, 3)) * 0.3
    d = jax.random.normal(kd, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    z = jnp.sort(jax.random.uniform(kz, (n, s), minval=0.1, maxval=2.5), -1)
    return field, params, o, d, z


def test_fused_cp_composite_softplus_parity(cp_setup):
    from mirror_nerf_tpu.ops.pallas.fused_cp import (fused_cp_rays_composite,
                                                     fused_cp_rays_eval)

    field, params, o, d, z = cp_setup
    got = fused_cp_rays_composite(field, params, o, d, d, z, interpret=True,
                                  sigma_act="softplus")
    per = fused_cp_rays_eval(field, params, o, d, d, z, interpret=True)
    w_ref = _composite_weights(per["sigma"], z, jnp.zeros_like(z),
                               "softplus")
    np.testing.assert_allclose(np.asarray(got["weights"]),
                               np.asarray(w_ref), atol=2e-2)
    rgb_ref = jnp.einsum("ns,cns->nc", w_ref, per["rgb3"])
    np.testing.assert_allclose(np.asarray(got["rgb"]), np.asarray(rgb_ref),
                               atol=2e-2)
    # and it actually differs from relu compositing
    rel = fused_cp_rays_composite(field, params, o, d, d, z, interpret=True)
    assert float(jnp.abs(got["weights"] - rel["weights"]).max()) > 1e-4


def test_fused_t_composite_softplus_parity():
    from mirror_nerf_tpu.models.fields import MirrorNeRFField
    from mirror_nerf_tpu.ops.pallas.fused_mlp import fused_rays_eval
    from mirror_nerf_tpu.ops.pallas.fused_mlp_t import fused_t_rays_eval

    field = MirrorNeRFField(predict_normal=True, predict_mirror_mask=True)
    params = field.init(jax.random.PRNGKey(0))
    n, s = 4, 16
    ko, kd, kz = jax.random.split(jax.random.PRNGKey(1), 3)
    o = jax.random.normal(ko, (n, 3)) * 0.3
    d = jax.random.normal(kd, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    z = jnp.sort(jax.random.uniform(kz, (n, s), minval=0.1, maxval=2.5), -1)
    got = fused_t_rays_eval(field, params, o, d, d, z, interpret=True,
                            sigma_act="softplus")
    rows = fused_rays_eval(field, params, o, d, d, z, interpret=True)
    sig = rows[:, 0].astype(jnp.float32).reshape(n, s)
    w_ref = _composite_weights(sig, z, jnp.zeros_like(z), "softplus")
    np.testing.assert_allclose(np.asarray(got["weights"]),
                               np.asarray(w_ref), atol=2e-2)


def test_render_rays_softplus_end_to_end(cp_setup):
    """Unfused renderer with softplus: weights differ from relu, sum <= 1."""
    from mirror_nerf_tpu.core.rays import make_ray_buffer

    field, params, o, d, z = cp_setup
    rays = make_ray_buffer(o, d, 0.1, 2.5)
    prm = {"coarse": params, "fine": params}
    common = dict(N_samples=8, N_importance=8, perturb=0.0, noise_std=0.0,
                  test_time=True, compute_normal=False, fine_pass="fine")
    key = jax.random.PRNGKey(0)
    soft = render_rays(field, prm, rays, key,
                       RenderSettings(sigma_activation="softplus", **common))
    relu = render_rays(field, prm, rays, key, RenderSettings(**common))
    assert float(jnp.abs(soft["rgb_fine"] - relu["rgb_fine"]).max()) > 1e-5
    assert float(soft["opacity_fine"].max()) <= 1.0 + 1e-5


def test_train_step_softplus(tmp_path):
    """One optimizer step through softplus compositing: finite loss, params
    move, and the compiled step is keyed on the activation."""
    from mirror_nerf_tpu.parallel.mesh import get_mesh
    from mirror_nerf_tpu.train.loop import EpochStatics, Trainer

    class _DS:
        def __init__(self):
            rng = np.random.default_rng(0)
            n = 256
            o = rng.normal(size=(n, 3)).astype(np.float32)
            d = rng.normal(size=(n, 3)).astype(np.float32)
            d /= np.linalg.norm(d, axis=-1, keepdims=True)
            nf = np.broadcast_to(np.array([0.05, 8.0], np.float32), (n, 2))
            self.all_rays = np.concatenate([o, d, nf], -1)
            self.all_rgbs = rng.uniform(size=(n, 3)).astype(np.float32)
            self.all_mirror_masks = (
                rng.uniform(size=(n,)) < 0.2).astype(np.float32)
            self.train_geometry_stage = False

        def __len__(self):
            return len(self.all_rays)

    cfg = Config(root_dir=str(tmp_path), img_wh=(8, 8), near=0.05, far=8.0,
                 bound=6.0, model_type="nerf_tpu", N_samples=8,
                 N_importance=8, batch_size=64, num_epochs=1,
                 predict_normal=True, predict_mirror_mask=True,
                 trace_secondary_rays=True, train_geometry_stage=False,
                 smooth_mirror_start_epoch=0,
                 train_mirror_mask_start_epoch=0, train_normal_start_epoch=0,
                 use_plane_consistent_loss=True, lr=5e-4,
                 sigma_activation="softplus")
    ds = _DS()
    tr = Trainer(cfg, ds, str(tmp_path / "run"), mesh=get_mesh(1))
    statics = EpochStatics.of(cfg, 1, False)
    step = tr.get_step_fn(statics)
    batch = {"rays": jnp.asarray(ds.all_rays[:64]),
             "rgbs": jnp.asarray(ds.all_rgbs[:64]),
             "mirror_mask": jnp.asarray(ds.all_mirror_masks[:64])}
    p0 = jax.tree_util.tree_map(np.asarray, tr.params)  # snapshot: the
    # compiled step donates its params buffers
    params, _, aux = step(tr.params, tr.opt_state, batch,
                          jax.random.PRNGKey(0))
    assert np.isfinite(float(aux["loss"]))
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(jnp.asarray(a) - b).max()), p0, params)
    assert max(jax.tree_util.tree_leaves(moved)) > 0


def test_cli_flag_roundtrip():
    cfg = get_opts(["--root_dir", "/tmp", "--sigma_activation", "softplus"])
    assert cfg.sigma_activation == "softplus"
