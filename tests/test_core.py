"""Unit tests for core math: embeddings, rays, sampling, reflection."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mirror_nerf_tpu.core import rays as ray_mod
from mirror_nerf_tpu.core.mathutil import l2_normalize, reflect
from mirror_nerf_tpu.core.sampling import (
    merge_fine_z_vals,
    sample_pdf,
    stratified_z_vals,
)
from mirror_nerf_tpu.models.embedding import posenc, posenc_dim


class TestPosenc:
    def test_dims(self):
        assert posenc_dim(3, 10) == 63
        assert posenc_dim(3, 4) == 27

    def test_identity_for_zero_freqs(self):
        x = jnp.array([[0.3, -0.2, 0.9]])
        np.testing.assert_array_equal(posenc(x, 0), x)

    def test_layout_matches_reference_convention(self):
        # [x, sin(2^0 x), cos(2^0 x), sin(2^1 x), cos(2^1 x), ...]
        x = np.array([[0.37, -1.2, 2.5]], np.float32)
        out = np.asarray(posenc(jnp.asarray(x), 3))
        expected = [x]
        for k in range(3):
            f = 2.0 ** k
            expected += [np.sin(f * x), np.cos(f * x)]
        expected = np.concatenate(expected, axis=-1)
        np.testing.assert_allclose(out, expected, rtol=1e-6, atol=1e-6)


class TestRays:
    def test_center_pixel_looks_down_minus_z(self):
        d = ray_mod.get_ray_directions(4, 4, focal=10.0)
        # pixel (2,2) sits exactly at the principal point (W/2, H/2)
        np.testing.assert_allclose(d[2, 2], [0.0, 0.0, -1.0], atol=1e-6)

    def test_get_rays_identity_pose(self):
        d = ray_mod.get_ray_directions(3, 5, focal=7.0)
        c2w = np.eye(4)[:3]
        o, dd = ray_mod.get_rays(d, c2w)
        assert o.shape == (15, 3) and dd.shape == (15, 3)
        np.testing.assert_allclose(o, 0.0, atol=1e-7)
        np.testing.assert_allclose(np.linalg.norm(dd, axis=-1), 1.0, rtol=1e-6)

    def test_get_rays_translation(self):
        d = ray_mod.get_ray_directions(2, 2, focal=1.0)
        c2w = np.concatenate([np.eye(3), np.array([[1.0], [2.0], [3.0]])], 1)
        o, _ = ray_mod.get_rays(d, c2w)
        np.testing.assert_allclose(o, np.tile([1.0, 2.0, 3.0], (4, 1)))

    def test_ray_buffer_layout(self):
        o = np.zeros((5, 3), np.float32)
        dd = np.ones((5, 3), np.float32)
        buf = ray_mod.make_ray_buffer(o, dd, 0.05, 8.0)
        assert buf.shape == (5, 8)
        np.testing.assert_allclose(buf[:, 6], 0.05)
        np.testing.assert_allclose(buf[:, 7], 8.0)


class TestReflect:
    def test_normal_incidence(self):
        d = jnp.array([[0.0, 0.0, -1.0]])
        n = jnp.array([[0.0, 0.0, 1.0]])
        r = reflect(d, n)
        np.testing.assert_allclose(np.asarray(r), [[0.0, 0.0, 1.0]], atol=1e-6)

    def test_45_degrees(self):
        d = jnp.array([[1.0, 0.0, -1.0]]) / np.sqrt(2)
        n = jnp.array([[0.0, 0.0, 1.0]])
        r = reflect(d, n)
        np.testing.assert_allclose(np.asarray(r), [[1.0, 0.0, 1.0]] / np.sqrt(2),
                                   atol=1e-6)

    def test_energy_and_angle_preserved(self):
        key = jax.random.PRNGKey(3)
        d = l2_normalize(jax.random.normal(key, (64, 3)))
        n = l2_normalize(jax.random.normal(jax.random.PRNGKey(4), (64, 3)))
        r = reflect(d, n)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(r), axis=-1), 1.0, rtol=1e-5
        )
        # incident and reflected make equal angles with n: n·r == n·(-d)
        lhs = np.sum(np.asarray(n * r), -1)
        rhs = np.sum(np.asarray(n * (-d)), -1)
        np.testing.assert_allclose(lhs, rhs, atol=1e-5)


class TestSampling:
    def test_stratified_bounds_and_monotonic(self, rng):
        near = jnp.full((7, 1), 2.0)
        far = jnp.full((7, 1), 6.0)
        z = stratified_z_vals(rng, near, far, 32, perturb=1.0)
        z = np.asarray(z)
        assert z.shape == (7, 32)
        assert (z >= 2.0 - 1e-5).all() and (z <= 6.0 + 1e-5).all()
        assert (np.diff(z, axis=-1) > -1e-6).all()

    def test_stratified_no_perturb_is_linspace(self, rng):
        near = jnp.full((2, 1), 1.0)
        far = jnp.full((2, 1), 3.0)
        z = stratified_z_vals(rng, near, far, 5, perturb=0.0)
        np.testing.assert_allclose(np.asarray(z[0]), np.linspace(1, 3, 5), rtol=1e-6)

    def test_disparity_sampling(self, rng):
        near = jnp.full((1, 1), 1.0)
        far = jnp.full((1, 1), 4.0)
        z = stratified_z_vals(rng, near, far, 3, use_disp=True, perturb=0.0)
        np.testing.assert_allclose(np.asarray(z[0]), [1.0, 1.6, 4.0], rtol=1e-5)

    def test_sample_pdf_uniform_weights_det(self, rng):
        bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 9), (4, 9))
        w = jnp.ones((4, 8))
        s = sample_pdf(rng, bins, w, 16, det=True)
        s = np.asarray(s)
        assert s.shape == (4, 16)
        # uniform pdf + det linspace u -> (nearly) evenly spaced samples
        np.testing.assert_allclose(s[0], np.linspace(0, 1, 16), atol=0.02)

    def test_sample_pdf_concentrates(self, rng):
        bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 11), (1, 11))
        w = jnp.zeros((1, 10)).at[0, 7].set(1000.0)
        s = np.asarray(sample_pdf(rng, bins, w, 64, det=False))
        # nearly all samples land in bin 7: [0.7, 0.8]
        assert ((s > 0.65) & (s < 0.85)).mean() > 0.95

    def test_sample_pdf_matches_searchsorted_oracle(self, rng):
        # det=True makes u a reproducible linspace, so a brute-force numpy
        # searchsorted oracle can check the gather-free TPU formulation.
        rng_np = np.random.default_rng(5)
        N, M, K = 7, 12, 9
        bins = np.sort(rng_np.uniform(1, 5, (N, M + 1)), axis=-1)
        w = rng_np.uniform(0, 1, (N, M)).astype(np.float32)
        ours = np.asarray(sample_pdf(rng, jnp.asarray(bins, jnp.float32),
                                     jnp.asarray(w), K, det=True))
        eps = 1e-5
        wp = w + eps
        pdf = wp / wp.sum(-1, keepdims=True)
        cdf = np.concatenate([np.zeros((N, 1)), np.cumsum(pdf, -1)], -1)
        u = np.broadcast_to(np.linspace(0, 1, K), (N, K))
        ref = np.empty((N, K))
        for n in range(N):
            inds = np.searchsorted(cdf[n], u[n], side="right")
            below = np.maximum(inds - 1, 0)
            above = np.minimum(inds, M)
            c_lo, c_hi = cdf[n][below], cdf[n][above]
            b_lo, b_hi = bins[n][below], bins[n][above]
            den = np.where(c_hi - c_lo < eps, 1.0, c_hi - c_lo)
            ref[n] = b_lo + (u[n] - c_lo) / den * (b_hi - b_lo)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_merge_fine_sorted_and_shaped(self, rng):
        z = jnp.broadcast_to(jnp.linspace(1.0, 2.0, 8), (3, 8))
        w = jax.random.uniform(rng, (3, 8))
        merged = merge_fine_z_vals(rng, z, w, 8, perturb=1.0)
        merged = np.asarray(merged)
        assert merged.shape == (3, 16)
        assert (np.diff(merged, axis=-1) >= 0).all()

    def test_sample_pdf_no_grad_to_weights_via_merge(self, rng):
        # merge_fine_z_vals must stop gradients into the coarse weights
        z = jnp.broadcast_to(jnp.linspace(1.0, 2.0, 8), (2, 8))

        def f(w):
            return jnp.sum(merge_fine_z_vals(rng, z, w, 4, perturb=1.0))

        g = jax.grad(f)(jnp.ones((2, 8)) * 0.5)
        np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-7)


class TestNDC:
    def test_ndc_rays_map_depth_range_to_unit_interval(self):
        # forward-facing camera at origin looking down -z
        H, W, focal = 12, 16, 20.0
        d = ray_mod.get_ray_directions(H, W, focal)
        o, dd = ray_mod.get_rays(d, np.eye(4)[:3])
        o_ndc, d_ndc = ray_mod.get_ndc_rays(H, W, focal, 1.0, o, dd)
        assert np.isfinite(o_ndc).all() and np.isfinite(d_ndc).all()
        # points at the near plane (t=0) have z=o2; at t=1 z=o2+d2=1
        np.testing.assert_allclose(o_ndc[:, 2] + d_ndc[:, 2], 1.0, atol=1e-5)
        # the center ray starts at the near plane z: 1 + 2*near/(-near) = -1
        center = (H // 2) * W + W // 2
        np.testing.assert_allclose(o_ndc[center, 2], -1.0, atol=1e-5)
