"""Fused training kernels (ops/pallas/fused_cp_train.py): value, gradient,
and grad-of-grad parity vs the XLA autodiff path, plus a short train-step
trajectory equivalence run (interpret mode on CPU).

The custom VJP hand-implements the second-order terms of the σ-gradient
normal (the ∂/∂θ⟨n̄, ∇σ⟩ products); these tests pin it against
`jax.vjp`/`jax.grad` of the unfused implementation.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mirror_nerf_tpu.models.tpugrid import TPUGridField
from mirror_nerf_tpu.ops.pallas.fused_cp_train import (density_fused,
                                                       density_with_grad_fused)
from mirror_nerf_tpu.render.renderer import _density_with_grad


@pytest.fixture(scope="module")
def setup():
    field = TPUGridField(predict_normal=True, predict_mirror_mask=True,
                         bound=6.0, grid_levels=((16, 8), (33, 16)))
    params = field.init(jax.random.PRNGKey(0))
    T = 1500  # non-multiple of the kernel lane count: exercises padding
    x = jax.random.uniform(jax.random.PRNGKey(1), (T, 3),
                           minval=-6.2, maxval=6.2)  # includes out-of-bound
    return field, params, x


def _rel(a, b):
    return float(jnp.abs(a - b).max()) / (float(jnp.abs(a).max()) + 1e-8)


def test_value_parity(setup):
    field, params, x = setup
    s0, g0, n0 = _density_with_grad(field, params, x)
    s1, g1, n1 = density_with_grad_fused(field, params, x, interpret=True)
    assert _rel(s0, s1) < 1e-5
    assert _rel(g0, g1) < 1e-5
    assert _rel(n0, n1) < 1e-5


def test_grad_and_grad_of_grad_parity(setup):
    """Cotangents on σ, geo AND ∇σ (through tanh, so the ∇σ cotangent is
    nonzero and x-dependent): exercises every second-order term."""
    field, params, x = setup
    T = x.shape[0]
    ca = jax.random.normal(jax.random.PRNGKey(2), (T,))
    cb = jax.random.normal(jax.random.PRNGKey(3), (T, 15))
    cc = jax.random.normal(jax.random.PRNGKey(4), (T, 3))

    def loss(fn, p, xx):
        s, g, n = fn(field, p, xx)
        return jnp.sum(s * ca) + jnp.sum(g * cb) + jnp.sum(jnp.tanh(n) * cc)

    fused = lambda f, p, xx: density_with_grad_fused(f, p, xx, interpret=True)
    l0, g0 = jax.value_and_grad(
        lambda p, xx: loss(_density_with_grad, p, xx), argnums=(0, 1))(params, x)
    l1, g1 = jax.value_and_grad(
        lambda p, xx: loss(fused, p, xx), argnums=(0, 1))(params, x)
    assert abs(float(l0) - float(l1)) < 1e-4 * abs(float(l0))
    errs = jax.tree_util.tree_map(lambda a, b: _rel(a, b), g0[0], g1[0])
    assert max(jax.tree_util.tree_leaves(errs)) < 5e-5
    assert _rel(g0[1], g1[1]) < 5e-5  # d_x including the ∇σ cross terms


def test_density_only_parity(setup):
    field, params, x = setup
    T = x.shape[0]
    ca = jax.random.normal(jax.random.PRNGKey(5), (T,))
    cb = jax.random.normal(jax.random.PRNGKey(6), (T, 15))

    def loss(fn, p, xx):
        s, g = fn(p, xx)
        return jnp.sum(s * ca) + jnp.sum(g * cb)

    ref = lambda p, xx: field.density(p, xx)
    fus = lambda p, xx: density_fused(field, p, xx, interpret=True)
    l0, g0 = jax.value_and_grad(
        lambda p, xx: loss(ref, p, xx), argnums=(0, 1))(params, x)
    l1, g1 = jax.value_and_grad(
        lambda p, xx: loss(fus, p, xx), argnums=(0, 1))(params, x)
    assert abs(float(l0) - float(l1)) < 1e-4 * abs(float(l0))
    errs = jax.tree_util.tree_map(lambda a, b: _rel(a, b), g0[0], g1[0])
    assert max(jax.tree_util.tree_leaves(errs)) < 5e-5
    assert _rel(g0[1], g1[1]) < 5e-5


def test_need_dx_false_skips_x_grad(setup):
    field, params, x = setup

    def loss(p, xx):
        s, g = density_fused(field, p, xx, need_dx=False, interpret=True)
        return jnp.sum(s)

    dx = jax.grad(loss, argnums=1)(params, x)
    assert float(jnp.abs(dx).max()) == 0.0


@pytest.mark.slow
def test_train_step_trajectory_equivalence(tmp_path):
    """A few full reflection-stage train steps: the fused path must follow
    the unfused trajectory (same batches/keys) to fp32 tolerance."""
    from mirror_nerf_tpu.config import Config
    from mirror_nerf_tpu.data.blender import BlenderDataset
    from mirror_nerf_tpu.data.synthetic import generate_scene
    from mirror_nerf_tpu.parallel.mesh import get_mesh
    from mirror_nerf_tpu.train.loop import EpochStatics, Trainer

    root = str(tmp_path / "scene")
    generate_scene(root, n_train=2, n_val=1, n_test=1, img_wh=(16, 16))
    base = dict(
        root_dir=root, img_wh=(16, 16), near=0.05, far=12.0, bound=6.0,
        model_type="nerf_tpu", grid_levels="16:8,32:8",
        N_samples=6, N_importance=6, batch_size=96, num_epochs=2,
        predict_normal=True, predict_mirror_mask=True,
        trace_secondary_rays=True, only_trace_rays_in_mirrors=True,
        use_plane_consistent_loss=True, smooth_mirror_start_epoch=0,
        train_mirror_mask_start_epoch=0, train_normal_start_epoch=0,
        novel_ray_batch=32, chunk=256,
    )
    trajs = {}
    for mode in ("off", "on"):
        cfg = Config(fused_train=mode, **base)
        ds = BlenderDataset(root, "train", cfg.img_wh, cfg)
        trainer = Trainer(cfg, ds, str(tmp_path / f"run_{mode}"),
                          mesh=get_mesh())
        step = trainer.get_step_fn(EpochStatics.of(cfg, 1, False))
        rays, rgbs, masks = ds.train_buffers()
        params, opt = trainer.params, trainer.opt_state
        losses = []
        for i in range(3):
            s = i * cfg.batch_size
            batch = {
                "rays": jnp.asarray(rays[s:s + cfg.batch_size]),
                "rgbs": jnp.asarray(rgbs[s:s + cfg.batch_size]),
                "mirror_mask": jnp.asarray(masks[s:s + cfg.batch_size]),
            }
            params, opt, aux = step(params, opt, batch, jax.random.PRNGKey(i))
            losses.append(float(aux["loss"]))
        trajs[mode] = (losses, params)
    np.testing.assert_allclose(trajs["off"][0], trajs["on"][0], rtol=2e-4)
    leaves0 = jax.tree_util.tree_leaves(trajs["off"][1])
    leaves1 = jax.tree_util.tree_leaves(trajs["on"][1])
    for a, b in zip(leaves0, leaves1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-4)
