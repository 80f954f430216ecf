"""Deep (while_loop) eval trace vs the unrolled trace, and 50-level compile."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mirror_nerf_tpu.eval.apps import EvalAppFlags, eval_trace, eval_trace_deep
from mirror_nerf_tpu.models.fields import MirrorNeRFField
from mirror_nerf_tpu.render.renderer import RenderSettings


@pytest.fixture(scope="module")
def setup():
    field = MirrorNeRFField(N_emb_xyz=4, N_emb_dir=2, depth=3, width=32,
                            skips=(1,))
    params = {"coarse": field.init(jax.random.PRNGKey(0)),
              "fine": field.init(jax.random.PRNGKey(1))}
    # non-empty scene: bias σ up
    for side in params:
        params[side]["sigma"]["b"] = params[side]["sigma"]["b"] + 3.0
    n = 64
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    o = jax.random.normal(k1, (n, 3)) * 0.1
    d = jax.random.normal(k2, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.concatenate(
        [o, d, jnp.full((n, 1), 0.5), jnp.full((n, 1), 3.0)], axis=1)
    rs = RenderSettings(N_samples=8, N_importance=8, perturb=0.0,
                        noise_std=0.0, test_time=True, compute_normal=False,
                        fine_pass="fine")
    return field, params, rays, rs


def test_deep_matches_unrolled_at_level2(setup):
    field, params, rays, rs = setup
    app = EvalAppFlags()
    kwargs = dict(rs=rs, app=app, max_recursive_level=2,
                  trace_secondary_rays=True)
    a = eval_trace(field, params, rays, jax.random.PRNGKey(3), **kwargs)
    b = eval_trace_deep(field, params, rays, jax.random.PRNGKey(3), **kwargs)
    # main rgb identical (deterministic rendering; same blend math)
    np.testing.assert_allclose(np.asarray(a["rgb_fine"]),
                               np.asarray(b["rgb_fine"]), atol=2e-5)
    np.testing.assert_array_equal(np.asarray(a["mirror_mask_resolved"]),
                                  np.asarray(b["mirror_mask_resolved"]))


def test_deep_50_levels_compiles_as_one_body(setup):
    field, params, rays, rs = setup
    app = EvalAppFlags()
    out = jax.jit(lambda p, r, k: eval_trace_deep(
        field, p, r, k, rs, app, 50, True))(params, rays,
                                            jax.random.PRNGKey(4))
    assert np.isfinite(np.asarray(out["rgb_fine"])).all()


def test_deep_with_plane_mirror(setup):
    from mirror_nerf_tpu.eval.apps import PlaneMirrorSpec

    field, params, rays, rs = setup
    app = EvalAppFlags(place_new_mirror=PlaneMirrorSpec(
        0, 0.5, (1, 0, 0), (-1, 1, -1, 1)))
    out = eval_trace_deep(field, params, rays, jax.random.PRNGKey(5), rs,
                          app, 5, True)
    assert np.isfinite(np.asarray(out["rgb_fine"])).all()
    # the injected plane forces mirror pixels somewhere
    assert np.asarray(out["mirror_mask_resolved"]).max() == 1.0


def test_deep_secondary_budget(setup):
    """Per-level budget on the deep path (round-5: the while_loop body is
    shape-invariant, so ALL levels >= 1 render at the one secondary budget).
    Contracts: equal-budget secondary is bitwise identical to None; a
    reduced budget leaves level-0 direct outputs untouched; key-structure
    mismatch is rejected."""
    field, params, rays, rs = setup
    app = EvalAppFlags()
    kwargs = dict(rs=rs, app=app, max_recursive_level=4,
                  trace_secondary_rays=True)
    base = eval_trace_deep(field, params, rays, jax.random.PRNGKey(3),
                           **kwargs)
    same = eval_trace_deep(field, params, rays, jax.random.PRNGKey(3),
                           rs_secondary=dataclasses.replace(rs), **kwargs)
    np.testing.assert_array_equal(np.asarray(base["rgb_fine"]),
                                  np.asarray(same["rgb_fine"]))
    red = eval_trace_deep(
        field, params, rays, jax.random.PRNGKey(3),
        rs_secondary=dataclasses.replace(rs, N_samples=4, N_importance=4),
        **kwargs)
    np.testing.assert_array_equal(np.asarray(base["rgb_fine_direct"]),
                                  np.asarray(red["rgb_fine_direct"]))
    np.testing.assert_array_equal(np.asarray(base["mirror_mask_resolved"]),
                                  np.asarray(red["mirror_mask_resolved"]))
    assert np.isfinite(np.asarray(red["rgb_fine"])).all()
    with pytest.raises(ValueError, match="has_fine"):
        eval_trace_deep(
            field, params, rays, jax.random.PRNGKey(3),
            rs_secondary=dataclasses.replace(rs, N_importance=0), **kwargs)
