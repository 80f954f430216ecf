"""Fused-kernel renderer path vs the unfused renderer (CPU interpret mode).

The fused path (RenderSettings.fused_field) swaps the per-sample field
evaluation for the packed Pallas kernel and composites on packed rows;
everything downstream (weights, PDF merge, tracing, blending) is shared.
These tests pin its equivalence to the standard path within bf16 tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mirror_nerf_tpu.models.fields import MirrorNeRFField
from mirror_nerf_tpu.render.renderer import RenderSettings, render_rays
from mirror_nerf_tpu.render.tracer import TraceSettings, trace_rays


@pytest.fixture(scope="module")
def setup():
    field = MirrorNeRFField(predict_normal=True, predict_mirror_mask=True,
                            compute_dtype="bfloat16")
    params = {
        "coarse": field.init(jax.random.PRNGKey(0)),
        "fine": field.init(jax.random.PRNGKey(1)),
    }
    n = 8
    key = jax.random.PRNGKey(2)
    o = jax.random.uniform(key, (n, 3), minval=-0.2, maxval=0.2)
    d = jax.random.normal(jax.random.PRNGKey(3), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.concatenate(
        [o, d, jnp.full((n, 1), 0.1), jnp.full((n, 1), 4.0)], axis=-1)
    return field, params, rays


def _settings(**kw):
    base = dict(N_samples=8, N_importance=8, perturb=0.0, noise_std=0.0,
                test_time=True, compute_normal=False, fine_pass="fine")
    base.update(kw)
    return RenderSettings(**base)


def test_render_rays_fused_matches_unfused(setup):
    field, params, rays = setup
    rng = jax.random.PRNGKey(7)
    ref = render_rays(field, params, rays, rng, _settings())
    fused = render_rays(field, params, rays, rng,
                        _settings(fused_field=True))
    np.testing.assert_allclose(np.asarray(fused["rgb_fine"]),
                               np.asarray(ref["rgb_fine"]), atol=2e-2)
    np.testing.assert_allclose(np.asarray(fused["depth_fine"]),
                               np.asarray(ref["depth_fine"]), atol=5e-2)
    np.testing.assert_allclose(np.asarray(fused["mirror_mask_fine"]),
                               np.asarray(ref["mirror_mask_fine"]), atol=2e-2)
    np.testing.assert_allclose(np.asarray(fused["surface_normal_fine"]),
                               np.asarray(ref["surface_normal_fine"]),
                               atol=5e-2)
    np.testing.assert_allclose(np.asarray(fused["opacity_coarse"]),
                               np.asarray(ref["opacity_coarse"]), atol=2e-2)


def test_trace_rays_fused_matches_unfused(setup):
    field, params, rays = setup
    rng = jax.random.PRNGKey(11)
    mask = jnp.full((rays.shape[0],), -1.0)
    ts_ref = TraceSettings(render=_settings(), trace_secondary_rays=True,
                           max_recursive_level=1, only_trace_mode="eval")
    ts_fused = TraceSettings(render=_settings(fused_field=True),
                             trace_secondary_rays=True,
                             max_recursive_level=1, only_trace_mode="eval")
    ref = trace_rays(field, params, rays, mask, rng, ts_ref)
    fused = trace_rays(field, params, rays, mask, rng, ts_fused)
    # the traced blend is mask-thresholded; bf16 jitter near the 0.5
    # threshold can flip lanes, so compare where both agree on the mask
    agree = np.asarray(ref["mirror_mask_resolved"]
                       == fused["mirror_mask_resolved"])
    assert agree.mean() >= 0.75
    np.testing.assert_allclose(np.asarray(fused["rgb_fine"])[agree],
                               np.asarray(ref["rgb_fine"])[agree], atol=3e-2)


