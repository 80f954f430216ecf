"""CP-grid encoder (numpy oracle) + TPUGridField training smoke test."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mirror_nerf_tpu.config import Config
from mirror_nerf_tpu.data.blender import BlenderDataset
from mirror_nerf_tpu.data.synthetic import generate_scene
from mirror_nerf_tpu.ops.cpgrid import (CPGridSpec, cpgrid_encode,
                                        cpgrid_tv_loss, init_cpgrid)
from mirror_nerf_tpu.parallel.mesh import get_mesh
from mirror_nerf_tpu.train.loop import Trainer


def _oracle_encode(params, x01, spec):
    """Straightforward numpy re-implementation."""
    x01 = np.clip(np.asarray(x01, np.float64), 0.0, 1.0)
    per_level = []
    for li, (g, r) in enumerate(spec.levels):
        prod = np.ones((x01.shape[0], r))
        for a in range(spec.input_dim):
            t = np.asarray(params["axes"][a][li], np.float64)
            xf = x01[:, a] * (g - 1)
            xi = np.minimum(np.floor(xf).astype(int), g - 2)
            w = (xf - xi)[:, None]
            prod = prod * (t[xi] * (1 - w) + t[xi + 1] * w)
        per_level.append(prod)
    feats = np.concatenate(per_level, -1)
    return feats @ np.asarray(params["fold"], np.float64)


def test_cpgrid_matches_oracle():
    spec = CPGridSpec(levels=((8, 4), (16, 4)), n_features=6)
    params = init_cpgrid(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=-0.2,
                           maxval=1.2)  # includes out-of-range (clamped)
    got = np.asarray(cpgrid_encode(params, x, spec))
    want = _oracle_encode(params, x, spec)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_cpgrid_dense_lookup_matches_gather():
    """The hat-basis-matmul lookup (the TPU training path) is the same
    interpolant as the paired-take lookup: values, table/fold gradients,
    and the grad-of-grad input gradient (σ-normal path) all agree."""
    spec = CPGridSpec(levels=((8, 4), (16, 4)), n_features=6)
    params = init_cpgrid(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=-0.2,
                           maxval=1.2)
    a = np.asarray(cpgrid_encode(params, x, spec, lookup="gather"))
    b = np.asarray(cpgrid_encode(params, x, spec, lookup="dense"))
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)

    # interior points only for derivative checks: at exact knots the two
    # formulations pick different (equal-valued) subgradients
    xi = jax.random.uniform(jax.random.PRNGKey(2), (64, 3), minval=0.013,
                            maxval=0.987)

    def loss(p, mode):
        return jnp.sum(cpgrid_encode(p, xi, spec, lookup=mode) ** 2)

    ga = jax.grad(lambda p: loss(p, "gather"))(params)
    gb = jax.grad(lambda p: loss(p, "dense"))(params)
    for la, lb in zip(jax.tree_util.tree_leaves(ga),
                      jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(la, lb, rtol=1e-4, atol=1e-5)

    def xgrad(mode):
        f = lambda xx: jnp.sum(cpgrid_encode(params, xx, spec, lookup=mode))
        return jax.grad(f)(xi)

    np.testing.assert_allclose(xgrad("gather"), xgrad("dense"),
                               rtol=1e-4, atol=1e-5)

    # grad-of-grad (the normal-supervision second order) stays finite/equal
    def gg(mode):
        f = lambda xx: jnp.sum(cpgrid_encode(params, xx, spec, lookup=mode))
        g = lambda xx: jnp.sum(jax.grad(f)(xx) ** 2)
        return jax.grad(g)(xi)

    np.testing.assert_allclose(gg("gather"), gg("dense"), rtol=1e-3,
                               atol=1e-4)


def test_cpgrid_differentiable_and_tv():
    spec = CPGridSpec(levels=((8, 4),), n_features=4)
    params = init_cpgrid(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3))

    def loss(p):
        return jnp.sum(cpgrid_encode(p, x, spec) ** 2) + cpgrid_tv_loss(p)

    g = jax.grad(loss)(params)
    # every table and the fold get gradient signal
    for a in range(3):
        assert float(jnp.sum(jnp.abs(g["axes"][a][0]))) > 0
    assert float(jnp.sum(jnp.abs(g["fold"]))) > 0
    # tv loss of a constant table is 0
    const = jax.tree_util.tree_map(jnp.ones_like, params)
    assert float(cpgrid_tv_loss(const)) == 0.0


def test_tpugrid_field_protocol():
    from mirror_nerf_tpu.models.tpugrid import TPUGridField

    field = TPUGridField(bound=2.0, predict_normal=True,
                         predict_mirror_mask=True,
                         grid_levels=((8, 8), (16, 8)))
    params = field.init(jax.random.PRNGKey(0))
    xyz = jax.random.uniform(jax.random.PRNGKey(1), (40, 3), minval=-2.0,
                             maxval=2.0)
    dirs = xyz / jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    sigma, geo = field.density(params, xyz)
    assert sigma.shape == (40,) and geo.shape == (40, 15)
    rgb = field.color(params, geo, dirs)
    assert rgb.shape == (40, 3)
    assert float(jnp.min(rgb)) >= 0 and float(jnp.max(rgb)) <= 1
    assert field.normal_head(params, geo).shape == (40, 3)
    assert field.mirror_head(params, geo).shape == (40,)


def test_grid_levels_flag_parsing():
    from mirror_nerf_tpu.config import Config
    from mirror_nerf_tpu.models.fields import make_field

    cfg = Config(model_type="nerf_tpu", grid_levels="16:8,32:4", bound=2.0)
    field = make_field(cfg)
    assert field.grid_levels == ((16, 8), (32, 4))
    assert field.cp_spec.total_rank == 12


@pytest.mark.slow
def test_tpugrid_two_stage_training_learns(tmp_path):
    root = str(tmp_path / "scene")
    generate_scene(root, n_train=4, n_val=1, n_test=1, img_wh=(24, 24))
    cfg = Config(
        root_dir=root, img_wh=(24, 24), near=0.05, far=12.0, bound=3.0,
        model_type="nerf_tpu", N_samples=8, N_importance=8, batch_size=128,
        num_epochs=2, predict_normal=True, predict_mirror_mask=True,
        trace_secondary_rays=True, train_geometry_stage=True,
        train_geometry_stage_end_epoch=1, only_trace_rays_in_mirrors=True,
        smooth_mirror_start_epoch=0, train_mirror_mask_start_epoch=0,
        train_normal_start_epoch=0, lr=5e-3, decay_step=(2, 4, 8),
        decay_gamma=0.5, use_plane_consistent_loss=True,
    )
    ds = BlenderDataset(root, "train", cfg.img_wh, cfg)
    trainer = Trainer(cfg, ds, str(tmp_path / "run"), mesh=get_mesh(1))
    rng = np.random.default_rng(0)
    out0 = trainer.run_epoch(0, rng)
    out1 = trainer.run_epoch(1, rng)
    assert np.isfinite(out1["loss"])
    assert out1["psnr"] > out0["psnr"] - 0.5  # learning, not diverging
    assert out1["psnr"] > 10.0


def test_cp_tv_wired_into_train_step(tmp_path):
    """--cp_tv_loss_weight adds the table-TV term to the nerf_tpu step and
    its gradient smooths the tables (adjacent-row energy decreases)."""
    root = str(tmp_path / "scene")
    generate_scene(root, n_train=2, n_val=1, n_test=1, img_wh=(16, 16))
    cfg = Config(
        root_dir=root, img_wh=(16, 16), near=0.05, far=12.0, bound=3.0,
        model_type="nerf_tpu", grid_levels="8:4,16:4",
        N_samples=8, N_importance=8, batch_size=64, num_epochs=1,
        predict_normal=True, predict_mirror_mask=True,
        trace_secondary_rays=False, train_geometry_stage=False,
        cp_tv_loss_weight=10.0, exp_name="t")
    ds = BlenderDataset(root, "train", (16, 16), cfg)
    tr = Trainer(cfg, ds, str(tmp_path / "log"), mesh=get_mesh(1))

    def roughness(params):
        return float(sum(cpgrid_tv_loss(params[m]["grid"]) for m in params))

    r0 = roughness(jax.device_get(tr.params))
    aux = tr.run_epoch(0, np.random.default_rng(0))
    assert "cp_tv" in aux and np.isfinite(aux["cp_tv"])
    r1 = roughness(jax.device_get(tr.params))
    assert r1 < r0  # the prior actually smooths the tables
