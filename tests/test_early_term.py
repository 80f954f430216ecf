"""Transmittance-based early termination of the fine pass."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mirror_nerf_tpu.render.renderer import RenderSettings, render_rays
from tests.test_occupancy import BallField


@pytest.fixture(scope="module")
def setup():
    field = BallField(N_emb_xyz=4, N_emb_dir=2, depth=2, width=24, skips=(),
                      predict_normal=True, predict_mirror_mask=True)
    n = 24
    rng_np = np.random.default_rng(2)
    o = np.zeros((n, 3), np.float32)
    o[:, 2] = 0.9
    d = rng_np.normal(size=(n, 3)).astype(np.float32) * 0.15
    d[:, 2] = -np.abs(d[:, 2]) - 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.asarray(np.concatenate(
        [o, d, np.full((n, 1), 0.05, np.float32),
         np.full((n, 1), 1.8, np.float32)], 1))
    rs = RenderSettings(N_samples=32, N_importance=32, perturb=0.0,
                        noise_std=0.0, compute_normal=False, test_time=True,
                        fine_pass="fine")
    return field, rays, rs


def test_early_term_matches_full(setup):
    field, rays, rs = setup
    params = {"coarse": None, "fine": None}
    full = render_rays(field, params, rays, jax.random.PRNGKey(0), rs)
    # the analytic ball is fully opaque: samples behind its surface carry
    # zero transmittance, so the fine pass skips ~the back half exactly
    et_rs = dataclasses.replace(rs, early_term_eps=1e-4, et_frac=0.7)
    fast = render_rays(field, params, rays, jax.random.PRNGKey(0), et_rs)
    np.testing.assert_allclose(np.asarray(fast["rgb_fine"]),
                               np.asarray(full["rgb_fine"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(fast["depth_fine"]),
                               np.asarray(full["depth_fine"]), atol=1e-3)
    np.testing.assert_allclose(np.asarray(fast["opacity_fine"]),
                               np.asarray(full["opacity_fine"]), atol=1e-4)


def test_keep_fraction_is_substantial(setup):
    # sanity that early termination actually drops a meaningful share
    field, rays, rs = setup
    params = {"coarse": None, "fine": None}
    full = render_rays(field, params, rays, jax.random.PRNGKey(0), rs)
    w_c = np.asarray(full["weights_coarse"])
    cum = np.concatenate([np.zeros((w_c.shape[0], 1)), np.cumsum(w_c, -1)], -1)
    zc = np.asarray(full["z_vals_coarse"])
    zf = np.asarray(full["z_vals_fine"])
    idx = (zc[:, None, :] <= zf[:, :, None]).sum(-1)
    t_bound = 1.0 - np.take_along_axis(cum, np.maximum(idx - 1, 0), -1)
    keep = (t_bound >= 1e-4).mean()
    assert keep < 0.8  # rays hit the opaque ball -> tail gets skipped
