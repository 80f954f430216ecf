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


def test_overflow_counter_counts_dropped_rays(setup):
    """>capacity mirror rays must surface in the compact_dropped indicator
    (the guard for the measured 7.6 dB silent-collapse footgun)."""
    field, params, rays, mask, ts = setup
    n = rays.shape[0]
    all_mirror = jnp.ones(n)
    ts_train = dataclasses.replace(
        ts, only_trace_mode="train", only_trace_rays_in_mirrors=True,
        max_recursive_level=1, compact_frac=0.5)
    out = trace_rays(field, params, rays, all_mirror, jax.random.PRNGKey(3),
                     ts_train)
    dropped = np.asarray(out["compact_dropped"])
    assert dropped.shape == (n,)
    # capacity rounds up to 128; the other 128 all-mirror rays are dropped
    assert dropped.sum() == n - 128
    # exactly the dropped lanes rendered without a reflection
    assert set(np.unique(dropped)).issubset({0.0, 1.0})


def test_no_overflow_counter_is_zero(setup):
    field, params, rays, mask, ts = setup
    count = _mirror_count(field, params, rays, mask, ts)
    assert count <= 128
    comp = trace_rays(field, params, rays, mask, jax.random.PRNGKey(3),
                      dataclasses.replace(ts, compact_frac=0.5))
    assert np.asarray(comp["compact_dropped"]).sum() == 0


def test_trainer_hard_fails_on_overflow():
    """The trainer's host-side guard raises above 1% dropped mirror rays."""
    from mirror_nerf_tpu.train.loop import check_compaction_overflow

    check_compaction_overflow(
        {"compact_dropped": 0.0, "compact_mirror": 800.0}, 0.25)
    check_compaction_overflow(
        {"compact_dropped": 4.0, "compact_mirror": 800.0}, 0.25)  # 0.5% ok
    with pytest.raises(RuntimeError, match="compaction overflow"):
        check_compaction_overflow(
            {"compact_dropped": 128.0, "compact_mirror": 800.0}, 0.25)
    check_compaction_overflow({}, 1.0)  # no compaction -> no counters


def test_step_fn_surfaces_overflow_counters(setup, tmp_path):
    """A forced all-mirror batch over capacity shows up in the step aux."""
    from mirror_nerf_tpu.config import Config
    from mirror_nerf_tpu.data.blender import BlenderDataset
    from mirror_nerf_tpu.data.synthetic import generate_scene
    from mirror_nerf_tpu.parallel.mesh import get_mesh
    from mirror_nerf_tpu.train.loop import EpochStatics, Trainer

    root = str(tmp_path / "scene")
    generate_scene(root, n_train=2, n_val=1, n_test=1, img_wh=(16, 16))
    cfg = Config(
        root_dir=root, img_wh=(16, 16), near=0.05, far=12.0, bound=6.0,
        N_samples=4, N_importance=0, batch_size=256, num_epochs=2,
        predict_normal=False, predict_mirror_mask=True,
        trace_secondary_rays=True, only_trace_rays_in_mirrors=True,
        compact_frac=0.25, chunk=256,
    )
    ds = BlenderDataset(root, "train", cfg.img_wh, cfg)
    trainer = Trainer(cfg, ds, str(tmp_path / "run"), mesh=get_mesh())
    step = trainer.get_step_fn(EpochStatics.of(cfg, 1, False))
    rays, rgbs, _ = ds.train_buffers()
    batch = {
        "rays": jnp.asarray(rays[:256]),
        "rgbs": jnp.asarray(rgbs[:256]),
        "mirror_mask": jnp.ones((256,), jnp.float32),  # force overflow
    }
    _, _, aux = step(trainer.params, trainer.opt_state, batch,
                     jax.random.PRNGKey(0))
    assert float(aux["compact_mirror"]) == 256.0
    assert float(aux["compact_dropped"]) == 128.0  # capacity floor is 128
    from mirror_nerf_tpu.train.loop import check_compaction_overflow
    with pytest.raises(RuntimeError, match="compaction overflow"):
        check_compaction_overflow(
            {k: float(v) for k, v in aux.items()}, cfg.compact_frac)
