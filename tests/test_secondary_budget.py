"""Per-level (secondary-bounce) sample budgets.

TPU-first eval knob absent from the reference (its CUDA eval renders every
recursion level at the full N_samples + N_importance, eval.py:114-170):
because each bounce level is a statically-shaped program, deeper levels can
legally render with a smaller stratified budget. Contracts pinned here:

  * `secondary_render=None` (default) and a secondary_render equal to the
    primary settings are bitwise identical — the knob is a pure no-op when
    not engaged.
  * a reduced budget changes only secondary-sourced outputs: level-0 direct
    rgb/depth and the mirror mask are bitwise unchanged; the blended rgb
    changes only inside the mirror mask.
  * the eval tracer (`eval_trace`) honors the same contract via
    `rs_secondary`.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mirror_nerf_tpu.eval.apps import EvalAppFlags, eval_trace
from mirror_nerf_tpu.models.fields import MirrorNeRFField
from mirror_nerf_tpu.render.renderer import RenderSettings
from mirror_nerf_tpu.render.tracer import TraceSettings, trace_rays


@pytest.fixture(scope="module")
def setup():
    field = MirrorNeRFField(N_emb_xyz=4, N_emb_dir=2, depth=3, width=32,
                            skips=(1,))
    params = {"coarse": field.init(jax.random.PRNGKey(0)),
              "fine": field.init(jax.random.PRNGKey(1))}
    for side in params:
        params[side]["sigma"]["b"] = params[side]["sigma"]["b"] + 3.0
    n = 192
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    o = jax.random.normal(k1, (n, 3)) * 0.1
    d = jax.random.normal(k2, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.concatenate(
        [o, d, jnp.full((n, 1), 0.5), jnp.full((n, 1), 3.0)], axis=1)
    rs = RenderSettings(N_samples=8, N_importance=8, perturb=0.0,
                        noise_std=0.0, test_time=True, compute_normal=False,
                        fine_pass="fine")
    ts = TraceSettings(render=rs, trace_secondary_rays=True,
                       max_recursive_level=2, only_trace_mode="eval",
                       is_eval=True)
    mask = jnp.full((n,), -1.0)
    return field, params, rays, mask, rs, ts


def test_equal_budget_is_noop(setup):
    field, params, rays, mask, rs, ts = setup
    key = jax.random.PRNGKey(3)
    base = trace_rays(field, params, rays, mask, key, ts)
    same = trace_rays(
        field, params, rays, mask, key,
        dataclasses.replace(ts, secondary_render=dataclasses.replace(rs)))
    for k in ("rgb_fine", "depth_fine", "mirror_mask_resolved"):
        np.testing.assert_array_equal(np.asarray(base[k]),
                                      np.asarray(same[k]), err_msg=k)


def test_reduced_budget_changes_only_mirror_pixels(setup):
    field, params, rays, mask, rs, ts = setup
    key = jax.random.PRNGKey(3)
    base = trace_rays(field, params, rays, mask, key, ts)
    red = trace_rays(
        field, params, rays, mask, key,
        dataclasses.replace(
            ts, secondary_render=dataclasses.replace(
                rs, N_samples=4, N_importance=4)))
    # direct (non-reflected) level-0 quantities are untouched
    np.testing.assert_array_equal(np.asarray(base["rgb_fine_direct"]),
                                  np.asarray(red["rgb_fine_direct"]))
    np.testing.assert_array_equal(np.asarray(base["depth_fine"]),
                                  np.asarray(red["depth_fine"]))
    np.testing.assert_array_equal(np.asarray(base["mirror_mask_resolved"]),
                                  np.asarray(red["mirror_mask_resolved"]))
    m = np.asarray(base["mirror_mask_resolved"]) > 0.5
    b = np.asarray(base["rgb_fine"])
    r = np.asarray(red["rgb_fine"])
    assert np.isfinite(r).all()
    # outside the mirror the blend weight of the secondary is 0
    np.testing.assert_array_equal(b[~m], r[~m])


def test_eval_trace_secondary_budget(setup):
    field, params, rays, mask, rs, ts = setup
    app = EvalAppFlags()
    key = jax.random.PRNGKey(5)
    base = eval_trace(field, params, rays, key, rs, app,
                      max_recursive_level=2, trace_secondary_rays=True)
    same = eval_trace(field, params, rays, key, rs, app,
                      max_recursive_level=2, trace_secondary_rays=True,
                      rs_secondary=dataclasses.replace(rs))
    np.testing.assert_array_equal(np.asarray(base["rgb_fine"]),
                                  np.asarray(same["rgb_fine"]))
    red = eval_trace(field, params, rays, key, rs, app,
                     max_recursive_level=2, trace_secondary_rays=True,
                     rs_secondary=dataclasses.replace(rs, N_samples=4,
                                                      N_importance=4))
    np.testing.assert_array_equal(np.asarray(base["rgb_fine_direct"]),
                                  np.asarray(red["rgb_fine_direct"]))
    m = np.asarray(base["mirror_mask_resolved"]) > 0.5
    np.testing.assert_array_equal(np.asarray(base["rgb_fine"])[~m],
                                  np.asarray(red["rgb_fine"])[~m])
    assert np.isfinite(np.asarray(red["rgb_fine"])).all()


def test_eval_trace_secondary_budget_compacted(setup):
    """Reduced budget composes with fixed-capacity compaction."""
    field, params, rays, mask, rs, ts = setup
    app = EvalAppFlags()
    key = jax.random.PRNGKey(7)
    kw = dict(max_recursive_level=2, trace_secondary_rays=True,
              compact_frac=0.999, compact_from_level=1)
    rs_sec = dataclasses.replace(rs, N_samples=4, N_importance=4)
    full = eval_trace(field, params, rays, key, rs, app,
                      rs_secondary=rs_sec, max_recursive_level=2,
                      trace_secondary_rays=True)
    comp = eval_trace(field, params, rays, key, rs, app,
                      rs_secondary=rs_sec, **kw)
    assert not np.asarray(comp.get("compact_dropped",
                                   jnp.zeros(()))).sum() > 0
    np.testing.assert_allclose(np.asarray(full["rgb_fine"]),
                               np.asarray(comp["rgb_fine"]), atol=2e-5)


def test_check_secondary_render_rejects_key_mismatch():
    """ADVICE r4: secondary_N_importance=0 with a 'fine' primary would make
    the secondary render emit only _coarse keys — eval_trace would KeyError
    (or trace_rays silently drop the reflection blend). The validator must
    reject it; budgets that keep has_fine are accepted."""
    from mirror_nerf_tpu.render.renderer import check_secondary_render

    rs = RenderSettings(N_samples=8, N_importance=8, fine_pass="fine")
    bad = dataclasses.replace(rs, N_importance=0)
    with pytest.raises(ValueError, match="has_fine"):
        check_secondary_render(rs, bad)
    check_secondary_render(rs, dataclasses.replace(rs, N_importance=4))
    check_secondary_render(rs, None)
    # coarse-only primary accepts a coarse-only secondary
    rs_c = RenderSettings(N_samples=8, N_importance=0, fine_pass="none")
    check_secondary_render(rs_c, dataclasses.replace(rs_c, N_samples=4))


def test_compute_normal_disable_sticks_across_levels():
    """ADVICE r4: with a predicted-normal field plus a secondary_render, the
    grad-normal disable must persist at level >= 2 (the carried
    secondary_render used to resurrect compute_normal=True)."""
    from mirror_nerf_tpu.render.tracer import next_level_settings

    field = MirrorNeRFField(N_emb_xyz=2, N_emb_dir=2, depth=2, width=16,
                            skips=(1,), predict_normal=True)
    rs = RenderSettings(N_samples=8, N_importance=8, compute_normal=True)
    rs_sec = dataclasses.replace(rs, N_samples=4, N_importance=4)
    ts = TraceSettings(render=rs, trace_secondary_rays=True,
                       max_recursive_level=3, secondary_render=rs_sec)
    ts1 = next_level_settings(field, ts)
    assert not ts1.render.compute_normal
    assert not ts1.secondary_render.compute_normal
    assert ts1.render.N_samples == 4  # reduced budget still applied
    ts2 = next_level_settings(field, ts1)
    assert not ts2.render.compute_normal  # stays off at level 2
    # settings are value-equal level-to-level (jit statics hash by equality,
    # so no retrace)
    assert ts2 == ts1
