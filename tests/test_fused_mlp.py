"""Fused Pallas field kernel vs the reference (unfused) field.

Runs in Pallas interpreter mode on the CPU test backend; the same kernel
compiles for TPU (exercised by bench.py on hardware).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mirror_nerf_tpu.ops.pallas.fused_mlp as fm
from mirror_nerf_tpu.core.mathutil import l2_normalize
from mirror_nerf_tpu.models.embedding import posenc
from mirror_nerf_tpu.models.fields import MirrorNeRFField


@pytest.fixture(scope="module")
def setup():
    field = MirrorNeRFField(predict_normal=True, predict_mirror_mask=True)
    params = field.init(jax.random.PRNGKey(0))
    n = 384  # not a multiple of TILE: exercises pad_batch + tile shrink
    xyz = jax.random.normal(jax.random.PRNGKey(1), (n, 3)) * 0.5
    dirs = jax.random.normal(jax.random.PRNGKey(2), (n, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return field, params, xyz, dirs


def test_full_outputs_match_unfused(setup):
    field, params, xyz, dirs = setup
    sigma, rgb, normal, mirror = fm.fused_field_eval(
        field, params, xyz, dirs, interpret=True)
    sigma_ref, geo = field.density(params, xyz)
    rgb_ref = field.color(params, geo, dirs)
    n_ref = l2_normalize(field.normal_head(params, geo))
    m_ref = field.mirror_head(params, geo)
    # bf16 operand tolerance
    np.testing.assert_allclose(np.asarray(sigma), np.asarray(sigma_ref),
                               atol=2e-2)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(normal), np.asarray(n_ref),
                               atol=2e-2)
    np.testing.assert_allclose(np.asarray(mirror), np.asarray(m_ref),
                               atol=5e-3)


def test_sigma_only_variant(setup):
    field, params, xyz, dirs = setup
    (sigma,) = fm.fused_field_eval(field, params, xyz, sigma_only=True,
                                   interpret=True)
    sigma_ref, _ = field.density(params, xyz)
    np.testing.assert_allclose(np.asarray(sigma), np.asarray(sigma_ref),
                               atol=2e-2)


def test_interleave_variants_match(setup):
    field, params, xyz, dirs = setup
    packed = fm.pack_params(params)
    xe = fm.pad_batch(posenc(xyz, 10), fm.XE_DIM, 256)
    de = fm.pad_batch(posenc(dirs, 4), fm.DE_DIM, 256)
    outs = [
        fm.fused_forward(packed, xe, de,
                         fm.FusedSpec(tile=256, interleave=il),
                         interpret=True)
        for il in (1, 2)
    ]
    np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(outs[1]),
                               atol=1e-5)


def test_pack_params_shapes(setup):
    _, params, _, _ = setup
    packed = fm.pack_params(params)
    assert packed["w0"].shape == (fm.XE_DIM, 256)
    assert packed["w4a"].shape == (fm.XE_DIM, 256)  # skip split: XE part
    assert packed["w4b"].shape == (256, 256)
    assert packed["wda"].shape == (256, 128)
    assert packed["wdb"].shape == (fm.DE_DIM, 128)
    assert packed["wsig"].shape == (256, fm.OUT_DIM)
    assert all(v.dtype == jnp.bfloat16 for k, v in packed.items()
               if k.startswith("w"))
    # head output lanes are disjoint: σ=0, rgb=1:4, normal=4:7, mirror=7
    assert np.all(np.asarray(packed["wsig"], np.float32)[:, 1:] == 0)
    assert np.all(np.asarray(packed["wrgb"], np.float32)[:, :1] == 0)
    assert np.all(np.asarray(packed["wrgb"], np.float32)[:, 4:] == 0)
    assert np.all(np.asarray(packed["wn2"], np.float32)[:, :4] == 0)
    assert np.all(np.asarray(packed["wn2"], np.float32)[:, 7:] == 0)
    assert np.all(np.asarray(packed["wm2"], np.float32)[:, :7] == 0)


def test_ray_mode_matches_unfused(setup):
    """fused_rays_eval builds xyz = o + d·z and both encodings in-kernel;
    its packed FINAL rows must match the unfused field + epilogue."""
    field, params, _, _ = setup
    n, s = 12, 16
    ko, kd, kz = jax.random.split(jax.random.PRNGKey(3), 3)
    o = jax.random.normal(ko, (n, 3)) * 0.3
    d = jax.random.normal(kd, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    z = jnp.sort(jax.random.uniform(kz, (n, s), minval=0.1, maxval=2.0), -1)
    rows = fm.fused_rays_eval(field, params, o, d, d, z, interpret=True)
    assert rows.shape == (n * s, fm.OUT_DIM)
    xyz = (o[:, None, :] + d[:, None, :] * z[..., None]).reshape(-1, 3)
    dirs = jnp.repeat(d, s, axis=0)
    sigma_ref, geo = field.density(params, xyz)
    rgb_ref = field.color(params, geo, dirs)
    n_ref = l2_normalize(field.normal_head(params, geo))
    m_ref = field.mirror_head(params, geo)
    rows = np.asarray(rows, np.float32)
    np.testing.assert_allclose(rows[:, 0], np.asarray(sigma_ref), atol=3e-2)
    np.testing.assert_allclose(rows[:, 1:4], np.asarray(rgb_ref), atol=1e-2)
    np.testing.assert_allclose(rows[:, 4:7], np.asarray(n_ref), atol=3e-2)
    np.testing.assert_allclose(rows[:, 7], np.ravel(np.asarray(m_ref)),
                               atol=1e-2)


def test_ray_mode_sigma_only_and_padding(setup):
    """Non-multiple ray counts pad correctly; σ-only path skips dirs."""
    field, params, _, _ = setup
    n, s = 7, 8  # r_blk default = 2048//8 = 256 -> pads 7 -> 256
    ko, kd, kz = jax.random.split(jax.random.PRNGKey(4), 3)
    o = jax.random.normal(ko, (n, 3)) * 0.3
    d = jax.random.normal(kd, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    z = jnp.sort(jax.random.uniform(kz, (n, s), minval=0.1, maxval=2.0), -1)
    rows = fm.fused_rays_eval(field, params, o, d, d, z, sigma_only=True,
                              interpret=True, rays_per_block=4)
    assert rows.shape == (n * s, fm.OUT_DIM)
    xyz = (o[:, None, :] + d[:, None, :] * z[..., None]).reshape(-1, 3)
    sigma_ref, _ = field.density(params, xyz)
    np.testing.assert_allclose(np.asarray(rows, np.float32)[:, 0],
                               np.asarray(sigma_ref), atol=3e-2)


def test_pad_batch():
    x = jnp.ones((100, 63))
    out = fm.pad_batch(x, fm.XE_DIM, tile=128)
    assert out.shape == (128, fm.XE_DIM)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out[:100, :63], np.float32), 1.0)
    np.testing.assert_allclose(np.asarray(out[100:, :], np.float32), 0.0)
