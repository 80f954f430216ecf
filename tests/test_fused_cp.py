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


def test_prefix_weights_with_delta_inf_sentinel():
    """Regression: the segmented roll-scan must compute the EXCLUSIVE
    transmittance prefix directly. The first version computed it as
    inclusive-minus-self; each ray's last sample carries the reference's
    δ_inf = 1e10 sentinel, and fp32 (1e10 + prefix) − 1e10 cancels the
    whole prefix — the last sample's weight then ignores occlusion (per-ray
    Σw reached ~2.0; held-out eval dropped from 23 dB to 7.9 dB)."""
    from jax.experimental import pallas as pl

    from mirror_nerf_tpu.ops.pallas.fused_mlp_t import _prefix_weights

    s, lanes = 16, 128
    rng = np.random.default_rng(0)
    # opaque mid-ray surface: transmittance collapses well before the last
    # sample, whose sd carries the 1e10 sentinel
    sd = rng.uniform(0.0, 1.5, (1, lanes)).astype(np.float32)
    sd[0, s - 1::s] = 1e10

    def kern(x_ref, o_ref):
        o_ref[...] = _prefix_weights(x_ref[...], s)

    got = np.asarray(pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((1, lanes), jnp.float32),
        interpret=True)(jnp.asarray(sd)))[0]

    x = sd[0].reshape(-1, s).astype(np.float64)
    cum = np.cumsum(x, -1) - x
    want = (np.exp(-cum) * (1.0 - np.exp(-x))).reshape(-1)
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert (got.reshape(-1, s).sum(-1) <= 1.0 + 1e-5).all()


def test_composite_opaque_scene_weights_sum_le_one(setup):
    """Composite kernels on a saturating-σ field: per-ray weights must sum
    to ≤ 1 and match the XLA compositing reference tightly (the δ_inf
    cancellation bug produced sums up to 2.0 on trained checkpoints)."""
    import dataclasses

    from mirror_nerf_tpu.ops.pallas.fused_cp import fused_cp_rays_composite
    from mirror_nerf_tpu.render.renderer import _composite_weights

    field, params, o, d, z = setup
    # scale the σ head so relu(σ) saturates transmittance mid-ray
    p2 = jax.tree_util.tree_map(lambda x: x, params)
    p2["sigma_net"] = [dict(lvl) for lvl in params["sigma_net"]]
    p2["sigma_net"][-1] = {
        "w": params["sigma_net"][-1]["w"]
        .at[:, 0].set(jnp.abs(params["sigma_net"][-1]["w"][:, 0]) * 40.0)}
    got = fused_cp_rays_composite(field, p2, o, d, d, z, interpret=True)
    per = fused_cp_rays_eval(field, p2, o, d, d, z, interpret=True)
    w_ref = _composite_weights(per["sigma"], z, jnp.zeros_like(z))
    np.testing.assert_allclose(np.asarray(got["weights"]),
                               np.asarray(w_ref), atol=2e-3)
    wsum = np.asarray(got["weights"]).sum(-1)
    assert (wsum <= 1.0 + 1e-4).all()


def test_proposal_drop_matches_truncated_field(setup):
    """drop_levels=k must equal evaluating a field whose finest k CP levels
    (tables + fold rows) were sliced away — the proposal-lite contract."""
    from mirror_nerf_tpu.ops.pallas.fused_cp import fused_cp_rays_composite

    field, params, o, d, z = setup
    # boost σ positive so the composite WEIGHTS comparison is non-vacuous
    # (random-init σ < 0 ⇒ relu(σ) = 0 ⇒ all weights identically zero)
    params = jax.tree_util.tree_map(lambda x: x, params)
    params["sigma_net"] = [dict(lvl) for lvl in params["sigma_net"]]
    params["sigma_net"][-1] = {
        "w": params["sigma_net"][-1]["w"]
        .at[:, 0].set(jnp.abs(params["sigma_net"][-1]["w"][:, 0]) * 5.0)}
    got = fused_cp_rays_eval(field, params, o, d, d, z, interpret=True,
                             sigma_only=True, drop_levels=1)
    gotc = fused_cp_rays_composite(field, params, o, d, d, z, interpret=True,
                                   sigma_only=True, drop_levels=1)
    full = fused_cp_rays_eval(field, params, o, d, d, z, interpret=True,
                              sigma_only=True)
    assert np.abs(np.asarray(got["sigma"])
                  - np.asarray(full["sigma"])).max() > 1e-4  # drop is real

    keep_r = field.grid_levels[0][1]
    tfield = TPUGridField(bound=field.bound, predict_normal=True,
                          predict_mirror_mask=True,
                          grid_levels=field.grid_levels[:1])
    tparams = dict(params)
    tparams["grid"] = {
        "axes": [[axs[0]] for axs in params["grid"]["axes"]],
        "fold": params["grid"]["fold"][:keep_r, :],
    }
    want = fused_cp_rays_eval(tfield, tparams, o, d, d, z, interpret=True,
                              sigma_only=True)
    np.testing.assert_allclose(np.asarray(got["sigma"]),
                               np.asarray(want["sigma"]), atol=1e-5)
    wantc = fused_cp_rays_composite(tfield, tparams, o, d, d, z,
                                    interpret=True, sigma_only=True)
    np.testing.assert_allclose(np.asarray(gotc["weights"]),
                               np.asarray(wantc["weights"]), atol=1e-5)


def test_proposal_drop_renderer_changes_only_proposal(setup):
    """Through render_rays, proposal_drop must leave the FINE pass's field
    evaluation untouched (same fine rgb as an undropped render when the
    proposal weights happen to agree is too strong; instead check the
    coarse weights differ while the fine pipeline still runs and composites
    to finite outputs)."""
    from mirror_nerf_tpu.render.renderer import RenderSettings, render_rays

    field, params, o, d, z = setup
    # random-init σ is all-negative (relu(σ) = 0 ⇒ all weights 0, and any
    # proposal change would be invisible) — push the σ column positive
    params = jax.tree_util.tree_map(lambda x: x, params)
    params["sigma_net"] = [dict(lvl) for lvl in params["sigma_net"]]
    params["sigma_net"][-1] = {
        "w": params["sigma_net"][-1]["w"]
        .at[:, 0].set(jnp.abs(params["sigma_net"][-1]["w"][:, 0]) * 5.0)}
    rays = jnp.concatenate(
        [o, d, jnp.full((o.shape[0], 1), 0.1), jnp.full((o.shape[0], 1), 2.5)],
        axis=-1)
    both = {"coarse": params, "fine": params}
    kwargs = dict(N_samples=16, N_importance=16, perturb=0.0, noise_std=0.0,
                  test_time=True, compute_normal=False, fine_pass="fine",
                  fused_field=True)
    r0 = render_rays(field, both, rays, jax.random.PRNGKey(0),
                     RenderSettings(**kwargs))
    r1 = render_rays(field, both, rays, jax.random.PRNGKey(0),
                     RenderSettings(**kwargs, proposal_drop=1))
    w0 = np.asarray(r0["weights_coarse"])
    w1 = np.asarray(r1["weights_coarse"])
    assert np.abs(w0 - w1).max() > 1e-6  # the proposal really changed
    assert np.isfinite(np.asarray(r1["rgb_fine"])).all()
