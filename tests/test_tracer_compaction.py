"""Cumsum-scatter secondary-ray compaction: exactness vs the full trace.

`compact_frac < 1` (and `compact_level0`) must leave the blended rgb
unchanged whenever the mirror-ray count fits the capacity — non-mirror
secondaries are blended with weight 0, so skipping them is exact.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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
    n = 256
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
    return field, params, rays, mask, ts


def _mirror_count(field, params, rays, mask, ts):
    full = trace_rays(field, params, rays, mask, jax.random.PRNGKey(3),
                      dataclasses.replace(ts, trace_secondary_rays=False))
    return int(np.asarray(full["mirror_mask_resolved"]).sum())


def test_deep_level_compaction_exact(setup):
    field, params, rays, mask, ts = setup
    full = trace_rays(field, params, rays, mask, jax.random.PRNGKey(3), ts)
    # capacity 0.5 (= 128 rays after rounding) — exact iff mirrors fit
    count = _mirror_count(field, params, rays, mask, ts)
    assert count <= 128, "fixture should have few mirror pixels"
    comp = trace_rays(field, params, rays, mask, jax.random.PRNGKey(3),
                      dataclasses.replace(ts, compact_frac=0.5))
    np.testing.assert_allclose(np.asarray(full["rgb_fine"]),
                               np.asarray(comp["rgb_fine"]), atol=2e-5)
    np.testing.assert_array_equal(
        np.asarray(full["mirror_mask_resolved"]),
        np.asarray(comp["mirror_mask_resolved"]))


def test_level0_compaction_exact_rgb(setup):
    field, params, rays, mask, ts = setup
    full = trace_rays(field, params, rays, mask, jax.random.PRNGKey(3), ts)
    comp = trace_rays(
        field, params, rays, mask, jax.random.PRNGKey(3),
        dataclasses.replace(ts, compact_frac=0.5, compact_level0=True))
    # final blended rgb is exact; the _reflect visualization becomes
    # mirror-only (zero outside), which is checked separately below
    np.testing.assert_allclose(np.asarray(full["rgb_fine"]),
                               np.asarray(comp["rgb_fine"]), atol=2e-5)
    m = np.asarray(full["mirror_mask_resolved"]) > 0.5
    ref_full = np.asarray(full["rgb_fine_reflect"])
    ref_comp = np.asarray(comp["rgb_fine_reflect"])
    np.testing.assert_allclose(ref_comp[m], ref_full[m], atol=2e-5)
    assert np.all(ref_comp[~m] == 0.0)


def test_overflow_degrades_not_crashes(setup):
    field, params, rays, mask, ts = setup
    # capacity 128 with a forced all-mirror mask: overflow path
    all_mirror = jnp.ones(rays.shape[0])
    out = trace_rays(field, params, rays, all_mirror,
                     jax.random.PRNGKey(3),
                     dataclasses.replace(ts, compact_frac=0.5))
    assert np.isfinite(np.asarray(out["rgb_fine"])).all()
