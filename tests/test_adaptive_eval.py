"""Adaptive-capacity eval: compacted views equal full-capacity views."""

import argparse

import jax
import numpy as np
import pytest

from mirror_nerf_tpu.config import Config
from mirror_nerf_tpu.eval.apps import (AppContext, pick_capacity,
                                       estimate_mirror_fraction, run_view)
from mirror_nerf_tpu.models.fields import MirrorNeRFField


def _args(**kw):
    ns = argparse.Namespace(
        render_coarse_rgb=False, app_place_new_mirror=False,
        app_control_mirror_roughness=False, app_reflection_substitution=False,
        app_reflect_newly_placed_objects=False, plane_pos="plane_x",
        trace_ray_times=1, normal_noise_std=0.0, normal_noise_std_changes=False,
        substitution_ckpt_path=None, obj_ckpt_path=None, obj_model_type="d_nerf")
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


def test_pick_capacity_buckets():
    assert pick_capacity(0.0) == 0.125
    assert pick_capacity(0.05) == 0.125
    assert pick_capacity(0.15) == 0.25
    assert pick_capacity(0.35) == 0.5
    assert pick_capacity(0.8) == 1.0


@pytest.mark.slow
def test_adaptive_view_matches_full_capacity():
    field = MirrorNeRFField(N_emb_xyz=4, N_emb_dir=2, depth=3, width=32,
                            skips=(1,))
    params = {"coarse": field.init(jax.random.PRNGKey(0)),
              "fine": field.init(jax.random.PRNGKey(1))}
    for side in params:
        params[side]["sigma"]["b"] = params[side]["sigma"]["b"] + 3.0
    cfg = Config(N_samples=8, N_importance=8, chunk=256,
                 max_recursive_level=2, trace_secondary_rays=True,
                 predict_normal=True, predict_mirror_mask=True)
    n = 512
    rng = np.random.default_rng(0)
    o = rng.normal(size=(n, 3)).astype(np.float32) * 0.1
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = np.concatenate(
        [o, d, np.full((n, 1), 0.5, np.float32),
         np.full((n, 1), 3.0, np.float32)], 1)
    sample = {"rays": rays}

    ctx = AppContext.build(cfg, _args(), field, params)
    adaptive = run_view(ctx, sample, 0.0, jax.random.PRNGKey(2))

    frac = estimate_mirror_fraction(ctx, rays, jax.random.PRNGKey(2))
    # force full capacity by monkeypatching the estimate high
    ctx2 = AppContext.build(cfg, _args(), field, params)
    ctx2_traced = ctx2.traced(1.0, has_noise=False)
    import jax.numpy as jnp

    full = np.asarray(ctx2_traced(
        params, jnp.asarray(rays[:256]), jax.random.fold_in(
            jax.random.PRNGKey(2), 0), jnp.float32(0.0),
        jnp.zeros((256, 3)))["rgb_fine"])
    np.testing.assert_allclose(adaptive["rgb_fine"][:256], full, atol=3e-5)
    assert 0.0 <= frac <= 1.0
