"""Transposed PE-MLP kernel (in-kernel compositing) vs the XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mirror_nerf_tpu.core.mathutil import l2_normalize
from mirror_nerf_tpu.models.fields import MirrorNeRFField
from mirror_nerf_tpu.ops.pallas.fused_mlp_t import fused_t_rays_eval
from mirror_nerf_tpu.render.renderer import _composite_weights


@pytest.fixture(scope="module")
def setup():
    field = MirrorNeRFField(predict_normal=True, predict_mirror_mask=True)
    params = field.init(jax.random.PRNGKey(0))
    n, s = 5, 16  # lanes=1024 -> 64 rays/block, pads 5 -> 64
    ko, kd, kz = jax.random.split(jax.random.PRNGKey(1), 3)
    o = jax.random.normal(ko, (n, 3)) * 0.3
    d = jax.random.normal(kd, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    z = jnp.sort(jax.random.uniform(kz, (n, s), minval=0.1, maxval=2.0), -1)
    return field, params, o, d, z


def _reference(field, params, o, d, z):
    n, s = z.shape
    xyz = (o[:, None, :] + d[:, None, :] * z[..., None]).reshape(-1, 3)
    dirs = jnp.repeat(d, s, axis=0)
    sigma, geo = field.density(params, xyz)
    w = _composite_weights(sigma.reshape(n, s), z,
                           jnp.zeros((n, s), jnp.float32))
    rgb = field.color(params, geo, dirs).reshape(n, s, 3)
    nrm = l2_normalize(field.normal_head(params, geo)).reshape(n, s, 3)
    mir = field.mirror_head(params, geo).reshape(n, s)
    return {
        "weights": np.asarray(w),
        "opacity": np.asarray(jnp.sum(w, -1)),
        "rgb": np.asarray(jnp.einsum("ns,nsc->nc", w, rgb)),
        "normal": np.asarray(jnp.einsum("ns,nsc->nc", w, nrm)),
        "mirror": np.asarray(jnp.sum(w * mir, -1)),
        "depth": np.asarray(jnp.sum(w * z, -1)),
    }


def test_t_kernel_matches_reference(setup):
    field, params, o, d, z = setup
    got = fused_t_rays_eval(field, params, o, d, d, z, interpret=True)
    want = _reference(field, params, o, d, z)
    for k in ("weights", "opacity", "rgb", "normal", "mirror", "depth"):
        np.testing.assert_allclose(np.asarray(got[k]), want[k], atol=3e-2,
                                   err_msg=k)


def test_t_renderer_equivalence(setup):
    """render_rays through the T path vs the rows-kernel fused path."""
    from mirror_nerf_tpu.core.rays import make_ray_buffer
    from mirror_nerf_tpu.render.renderer import RenderSettings, render_rays

    field, params, o, d, z = setup
    rays = make_ray_buffer(o, d, 0.1, 2.0)
    common = dict(N_samples=8, N_importance=8, perturb=0.0, noise_std=0.0,
                  test_time=True, compute_normal=False, fine_pass="fine",
                  fused_field=True)
    prm = {"coarse": params, "fine": params}
    key = jax.random.PRNGKey(0)
    t = render_rays(field, prm, rays, key,
                    RenderSettings(fused_t=True, **common))
    rows = render_rays(field, prm, rays, key,
                       RenderSettings(fused_t=False, **common))
    for k in ("rgb_fine", "depth_fine", "opacity_fine", "mirror_mask_fine",
              "surface_normal_fine", "weights_coarse"):
        np.testing.assert_allclose(np.asarray(t[k]), np.asarray(rows[k]),
                                   atol=3e-2, err_msg=k)


def test_t_spmd_mesh_equivalence(setup):
    """Fused T path under the 8-virtual-device data mesh == single device
    (pallas_call composes with GSPMD partitioning of the ray batch)."""
    from mirror_nerf_tpu.core.rays import make_ray_buffer
    from mirror_nerf_tpu.parallel.mesh import get_mesh
    from mirror_nerf_tpu.render.renderer import RenderSettings
    from mirror_nerf_tpu.render.tracer import TraceSettings
    from mirror_nerf_tpu.train.loop import render_image_chunked

    field, params, o, d, z = setup
    prm = {"coarse": params, "fine": params}
    rays = np.asarray(make_ray_buffer(
        jnp.tile(o, (13, 1)), jnp.tile(d, (13, 1)), 0.1, 2.0))  # 65 rays
    rs = RenderSettings(N_samples=8, N_importance=8, perturb=0.0,
                        noise_std=0.0, test_time=True, compute_normal=False,
                        fine_pass="fine", fused_field=True)
    ts = TraceSettings(render=rs, trace_secondary_rays=True,
                       max_recursive_level=1, only_trace_mode="eval",
                       is_eval=True)
    kw = dict(keys=("rgb_fine", "depth_fine"), chunk=24)
    sharded = render_image_chunked(field, prm, rays, None,
                                   jax.random.PRNGKey(0), ts,
                                   mesh=get_mesh(8), **kw)
    single = render_image_chunked(field, prm, rays, None,
                                  jax.random.PRNGKey(0), ts, mesh=None, **kw)
    for k in kw["keys"]:
        np.testing.assert_allclose(sharded[k], single[k], atol=1e-5,
                                   err_msg=k)


def test_t_kernel_sigma_only(setup):
    field, params, o, d, z = setup
    got = fused_t_rays_eval(field, params, o, d, d, z, sigma_only=True,
                            interpret=True)
    want = _reference(field, params, o, d, z)
    assert set(got.keys()) == {"weights"}
    np.testing.assert_allclose(np.asarray(got["weights"]), want["weights"],
                               atol=3e-2)
