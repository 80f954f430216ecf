"""Occupancy-grid empty-space skipping: lookup, compaction, render parity."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mirror_nerf_tpu.models.fields import MirrorNeRFField
from mirror_nerf_tpu.render.occupancy import (OccupancySpec,
                                              build_occupancy_grid,
                                              compact_apply,
                                              occupancy_lookup)
from mirror_nerf_tpu.render.renderer import RenderSettings, render_rays


class BallField(MirrorNeRFField):
    """Analytic: dense ball of radius 0.5 at origin; exact zero elsewhere."""

    def density(self, p, xyz):
        r = jnp.linalg.norm(xyz, axis=-1)
        sigma = jnp.where(r < 0.5, 50.0, 0.0)
        return sigma, jnp.tile(xyz, (1, self.width // 3 + 1))[:, :self.width]

    def color(self, p, geo, dirs):
        return jnp.broadcast_to(jnp.array([0.8, 0.4, 0.2]),
                                (geo.shape[0], 3))

    def normal_head(self, p, geo):
        return geo[:, :3]

    def mirror_head(self, p, geo):
        return jnp.zeros(geo.shape[0])


@pytest.fixture(scope="module")
def field():
    return BallField(N_emb_xyz=4, N_emb_dir=2, depth=2, width=24, skips=(),
                     predict_normal=True, predict_mirror_mask=True)


@pytest.fixture(scope="module")
def spec():
    return OccupancySpec.for_bound(1.0, resolution=32, sigma_threshold=0.01)


@pytest.fixture(scope="module")
def grid(field, spec):
    return build_occupancy_grid(field, None, spec, chunk=8192)


class TestGrid:
    def test_build_marks_ball(self, grid, spec):
        g = np.asarray(grid)
        r = spec.resolution
        # center occupied, corner empty
        assert g[r // 2, r // 2, r // 2]
        assert not g[1, 1, 1]
        # occupied fraction ≈ ball volume (4/3 π 0.25^3 / 8) + dilation
        assert 0.02 < g.mean() < 0.25

    def test_lookup(self, grid, spec):
        pts = jnp.array([[0.0, 0.0, 0.0], [0.9, 0.9, 0.9], [2.0, 0.0, 0.0]])
        occ = np.asarray(occupancy_lookup(grid, spec, pts))
        assert occ[0]  # ball center
        assert not occ[1]  # empty corner
        assert occ[2]  # outside AABB -> conservative occupied


class TestCompactApply:
    def test_matches_dense(self):
        rng = np.random.default_rng(0)
        m = 512
        x = jnp.asarray(rng.normal(size=(m, 3)).astype(np.float32))
        occ = jnp.asarray(rng.uniform(size=m) < 0.3)

        def fn(xc):
            return (jnp.sum(xc, -1) * 2.0, xc * 3.0)

        a, b = compact_apply(fn, occ, 256, (-7.0, 0.0), x)
        dense_a, dense_b = fn(x)
        np.testing.assert_allclose(np.asarray(a)[np.asarray(occ)],
                                   np.asarray(dense_a)[np.asarray(occ)],
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(a)[~np.asarray(occ)], -7.0)
        np.testing.assert_allclose(np.asarray(b)[~np.asarray(occ)], 0.0)

    def test_overflow_falls_back_to_defaults(self):
        m = 128
        x = jnp.ones((m, 1))
        occ = jnp.ones(m, bool)

        def fn(xc):
            return (xc[:, 0] + 1.0,)

        (out,) = compact_apply(fn, occ, 128, (0.0,), x)  # cap == count: fits
        np.testing.assert_allclose(np.asarray(out), 2.0)


class TestRenderParity:
    def test_occupancy_render_matches_full(self, field, grid, spec):
        # rays stay inside the AABB (out-of-AABB samples are conservatively
        # occupied, which would eat the capacity in this tiny test)
        n = 32
        rng_np = np.random.default_rng(1)
        o = np.zeros((n, 3), np.float32)
        o[:, 2] = 0.9
        d = rng_np.normal(size=(n, 3)).astype(np.float32) * 0.2
        d[:, 2] = -np.abs(d[:, 2]) - 1.0  # look towards the ball
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        rays = jnp.asarray(np.concatenate(
            [o, d, np.full((n, 1), 0.05, np.float32),
             np.full((n, 1), 1.8, np.float32)], 1))
        base_rs = RenderSettings(N_samples=32, N_importance=32, perturb=0.0,
                                 noise_std=0.0, compute_normal=False,
                                 test_time=True, fine_pass="fine")
        params = {"coarse": None, "fine": None}
        full = render_rays(field, params, rays, jax.random.PRNGKey(0), base_rs)

        # capacities above this dense test scene's measured occupancy
        # (~60% coarse / ~77% fine; trained scenes run far emptier)
        occ_rs = dataclasses.replace(base_rs, occupancy=spec,
                                     occ_frac_coarse=0.75, occ_frac_fine=0.85)
        params_occ = {**params, "occ_grid": grid}
        fast = render_rays(field, params_occ, rays, jax.random.PRNGKey(0),
                           occ_rs)
        # exact: the analytic field is 0 outside the ball and the grid is
        # dilated, so no contributing sample is skipped
        np.testing.assert_allclose(np.asarray(fast["rgb_fine"]),
                                   np.asarray(full["rgb_fine"]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(fast["depth_fine"]),
                                   np.asarray(full["depth_fine"]), atol=1e-4)
        np.testing.assert_allclose(np.asarray(fast["opacity_fine"]),
                                   np.asarray(full["opacity_fine"]),
                                   atol=1e-5)
