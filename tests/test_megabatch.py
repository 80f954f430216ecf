"""Megabatch eval dispatch: K-chunks-per-dispatch equals the K=1 path.

The megabatch path (`run_view` with --megabatch > 1) renders K chunks per
jit call via lax.map to amortize per-dispatch latency on tunneled TPU
attachments. Per-chunk math and per-chunk PRNG keys are identical to the
K=1 path, so outputs must match exactly.
"""

import argparse

import jax
import numpy as np
import pytest

from mirror_nerf_tpu.config import Config
from mirror_nerf_tpu.eval.apps import AppContext, run_view
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


def _scene(num_gpus=1, n=400):
    field = MirrorNeRFField(N_emb_xyz=4, N_emb_dir=2, depth=3, width=32,
                            skips=(1,))
    params = {"coarse": field.init(jax.random.PRNGKey(0)),
              "fine": field.init(jax.random.PRNGKey(1))}
    for side in params:
        params[side]["sigma"]["b"] = params[side]["sigma"]["b"] + 3.0
    cfg = Config(N_samples=8, N_importance=8, chunk=128,
                 max_recursive_level=1, trace_secondary_rays=True,
                 predict_normal=True, predict_mirror_mask=True,
                 num_gpus=num_gpus)
    rng = np.random.default_rng(0)
    o = rng.normal(size=(n, 3)).astype(np.float32) * 0.1
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = np.concatenate(
        [o, d, np.full((n, 1), 0.5, np.float32),
         np.full((n, 1), 3.0, np.float32)], 1)
    return field, params, cfg, {"rays": rays}


@pytest.mark.parametrize("n", [400, 384])  # non-multiple + multiple of chunk
def test_megabatch_matches_single_dispatch(n):
    field, params, cfg, sample = _scene(n=n)
    key = jax.random.PRNGKey(3)

    ctx1 = AppContext.build(cfg, _args(megabatch=1), field, params)
    ref = run_view(ctx1, sample, 0.0, key)

    ctx3 = AppContext.build(cfg, _args(megabatch=3), field, params)
    got = run_view(ctx3, sample, 0.0, key)

    assert set(got) == set(ref)
    for k in ref:
        assert got[k].shape == ref[k].shape, k
        np.testing.assert_allclose(got[k], ref[k], atol=1e-6, err_msg=k)


def test_render_image_chunked_megabatch_matches():
    from mirror_nerf_tpu.render.renderer import RenderSettings
    from mirror_nerf_tpu.render.tracer import TraceSettings
    from mirror_nerf_tpu.train.loop import render_image_chunked

    field, params, cfg, sample = _scene(n=400)
    rs = RenderSettings(N_samples=8, N_importance=8, perturb=0.0,
                        noise_std=0.0, test_time=True, compute_normal=False,
                        fine_pass="fine")
    ts = TraceSettings(render=rs, trace_secondary_rays=True,
                       max_recursive_level=1, only_trace_mode="eval")
    rng = jax.random.PRNGKey(7)
    ref = render_image_chunked(field, params, sample["rays"], None, rng, ts,
                               chunk=128, megabatch=1)
    got = render_image_chunked(field, params, sample["rays"], None, rng, ts,
                               chunk=128, megabatch=3)
    assert set(got) == set(ref)
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], atol=1e-6, err_msg=k)


def test_megabatch_with_mesh_matches():
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    field, params, cfg, sample = _scene(num_gpus=8)
    key = jax.random.PRNGKey(4)

    ctx1 = AppContext.build(cfg.replace(num_gpus=1),
                            _args(megabatch=1), field, params)
    ref = run_view(ctx1, sample, 0.0, key)

    ctx = AppContext.build(cfg, _args(megabatch=2), field, params)
    assert ctx.mesh is not None
    got = run_view(ctx, sample, 0.0, key)
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], atol=2e-5, err_msg=k)
