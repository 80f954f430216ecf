"""Fused CP-grid field kernel vs the unfused TPUGridField (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mirror_nerf_tpu.models.tpugrid import TPUGridField
from mirror_nerf_tpu.ops.pallas.fused_cp import fused_cp_rays_eval


@pytest.fixture(scope="module")
def setup():
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


def _reference(field, params, o, d, z):
    from mirror_nerf_tpu.core.mathutil import l2_normalize

    n, s = z.shape
    xyz = (o[:, None, :] + d[:, None, :] * z[..., None]).reshape(-1, 3)
    dirs = jnp.repeat(d, s, axis=0)
    sigma, geo = field.density(params, xyz)
    rgb = field.color(params, geo, dirs)
    nrm = l2_normalize(field.normal_head(params, geo))
    mir = field.mirror_head(params, geo)
    return (np.asarray(sigma).reshape(n, s),
            np.asarray(rgb).reshape(n, s, 3),
            np.asarray(nrm).reshape(n, s, 3),
            np.asarray(mir).reshape(n, s))


def test_fused_cp_matches_unfused(setup):
    field, params, o, d, z = setup
    res = fused_cp_rays_eval(field, params, o, d, d, z, interpret=True)
    sig_ref, rgb_ref, nrm_ref, mir_ref = _reference(field, params, o, d, z)
    np.testing.assert_allclose(np.asarray(res["sigma"]), sig_ref, atol=3e-2)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(res["rgb3"]), 0, -1), rgb_ref, atol=1e-2)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(res["normal3"]), 0, -1), nrm_ref, atol=3e-2)
    np.testing.assert_allclose(np.asarray(res["mirror"]), mir_ref, atol=1e-2)


def test_fused_cp_renderer_equivalence(setup):
    """render_rays with fused_field=True (CP dispatch) vs unfused."""
    from mirror_nerf_tpu.core.rays import make_ray_buffer
    from mirror_nerf_tpu.render.renderer import RenderSettings, render_rays

    field, params, o, d, z = setup
    rays = make_ray_buffer(o, d, 0.1, 2.5)
    common = dict(N_samples=8, N_importance=8, perturb=0.0, noise_std=0.0,
                  test_time=True, compute_normal=False, fine_pass="fine")
    prm = {"coarse": params, "fine": params}
    key = jax.random.PRNGKey(0)
    fused = render_rays(field, prm, rays, key,
                        RenderSettings(fused_field=True, **common))
    plain = render_rays(field, prm, rays, key,
                        RenderSettings(fused_field=False, **common))
    for k in ("rgb_fine", "depth_fine", "opacity_fine", "mirror_mask_fine",
              "surface_normal_fine"):
        np.testing.assert_allclose(np.asarray(fused[k]),
                                   np.asarray(plain[k]), atol=3e-2,
                                   err_msg=k)


def test_fused_cp_composite_matches_per_sample(setup):
    """Composite-mode kernel (in-kernel weights + per-ray render) vs the
    per-sample kernel + XLA compositing."""
    from mirror_nerf_tpu.ops.pallas.fused_cp import fused_cp_rays_composite
    from mirror_nerf_tpu.render.renderer import _composite_weights

    field, params, o, d, z = setup
    n, s = z.shape
    got = fused_cp_rays_composite(field, params, o, d, d, z, interpret=True)
    per = fused_cp_rays_eval(field, params, o, d, d, z, interpret=True)
    w_ref = _composite_weights(per["sigma"], z, jnp.zeros_like(z))
    np.testing.assert_allclose(np.asarray(got["weights"]),
                               np.asarray(w_ref), atol=2e-2)
    rgb_ref = jnp.einsum("ns,cns->nc", w_ref, per["rgb3"])
    np.testing.assert_allclose(np.asarray(got["rgb"]), np.asarray(rgb_ref),
                               atol=2e-2)
    np.testing.assert_allclose(np.asarray(got["depth"]),
                               np.asarray(jnp.sum(w_ref * z, -1)),
                               atol=2e-2)
    np.testing.assert_allclose(np.asarray(got["mirror"]),
                               np.asarray(jnp.sum(w_ref * per["mirror"],
                                                  -1)), atol=2e-2)

    sig = fused_cp_rays_composite(field, params, o, d, d, z,
                                  sigma_only=True, interpret=True)
    np.testing.assert_allclose(np.asarray(sig["weights"]),
                               np.asarray(w_ref), atol=2e-2)


def test_fused_cp_sigma_only(setup):
    field, params, o, d, z = setup
    res = fused_cp_rays_eval(field, params, o, d, d, z, sigma_only=True,
                             interpret=True)
    sig_ref, *_ = _reference(field, params, o, d, z)
    assert set(res.keys()) == {"sigma"}
    np.testing.assert_allclose(np.asarray(res["sigma"]), sig_ref, atol=3e-2)


def test_composite_ray_inputs_match_sample_inputs(setup):
    """Ray-input composite kernel (x3/d3/δ built in VMEM from per-ray rows)
    vs the sample-input composite kernel."""
    import os

    from mirror_nerf_tpu.ops.pallas.fused_cp import fused_cp_rays_composite

    field, params, o, d, z = setup
    ray = fused_cp_rays_composite(field, params, o, d, d, z, interpret=True)
    os.environ["MNERF_CP_RAYMODE"] = "0"
    try:
        smp = fused_cp_rays_composite(field, params, o, d, d, z,
                                      interpret=True)
    finally:
        del os.environ["MNERF_CP_RAYMODE"]
    for k in ("rgb", "depth", "opacity", "mirror", "weights"):
        np.testing.assert_allclose(np.asarray(ray[k]), np.asarray(smp[k]),
                                   atol=1e-4, err_msg=k)

    rs = fused_cp_rays_composite(field, params, o, d, d, z,
                                 sigma_only=True, interpret=True)
    os.environ["MNERF_CP_RAYMODE"] = "0"
    try:
        ss = fused_cp_rays_composite(field, params, o, d, d, z,
                                     sigma_only=True, interpret=True)
    finally:
        del os.environ["MNERF_CP_RAYMODE"]
    np.testing.assert_allclose(np.asarray(rs["weights"]),
                               np.asarray(ss["weights"]), atol=1e-4)


def test_cum_basis_matches_hat(setup):
    """The clamped-ramp ("cum") basis with difference-packed tables computes
    the same interpolant as the hat basis (exactly, up to dtype rounding)."""
    import os

    field, params, o, d, z = setup
    res_hat = fused_cp_rays_eval(field, params, o, d, d, z, interpret=True)
    os.environ["MNERF_CP_BASIS"] = "cum"
    try:
        res_cum = fused_cp_rays_eval(field, params, o, d, d, z,
                                     interpret=True)
    finally:
        del os.environ["MNERF_CP_BASIS"]
    for k in res_hat:
        np.testing.assert_allclose(np.asarray(res_cum[k]),
                                   np.asarray(res_hat[k]), atol=2e-5,
                                   err_msg=k)


def test_cum_basis_composite_matches(setup):
    import os

    from mirror_nerf_tpu.ops.pallas.fused_cp import fused_cp_rays_composite

    field, params, o, d, z = setup
    ref = fused_cp_rays_composite(field, params, o, d, d, z, interpret=True)
    os.environ["MNERF_CP_BASIS"] = "cum"
    try:
        got = fused_cp_rays_composite(field, params, o, d, d, z,
                                      interpret=True)
    finally:
        del os.environ["MNERF_CP_BASIS"]
    for k in ("rgb", "depth", "opacity", "mirror", "weights"):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   atol=2e-5, err_msg=k)
