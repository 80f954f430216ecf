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
    xyz = jax.random.normal(jax.random.PRNGKey(1), (fm.TILE, 3)) * 0.5
    dirs = jax.random.normal(jax.random.PRNGKey(2), (fm.TILE, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    packed = fm.pack_params(params)
    xe = fm.pad_batch(posenc(xyz, 10), fm.XE_DIM)
    de = fm.pad_batch(posenc(dirs, 4), fm.DE_DIM)
    return field, params, xyz, dirs, packed, xe, de


@pytest.mark.slow
def test_full_outputs_match_unfused(setup):
    field, params, xyz, dirs, packed, xe, de = setup
    out = fm.fused_forward(packed, xe, de, fm.FusedSpec(), interpret=True)
    sigma_ref, geo = field.density(params, xyz)
    rgb_ref = field.color(params, geo, dirs)
    n_ref = l2_normalize(field.normal_head(params, geo))
    m_ref = field.mirror_head(params, geo)
    # bf16 operand tolerance
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(sigma_ref),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(out[:, 1:4]), np.asarray(rgb_ref),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(out[:, 4:7]), np.asarray(n_ref),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(out[:, 7]), np.asarray(m_ref),
                               atol=2e-3)
    # padding lanes untouched
    np.testing.assert_allclose(np.asarray(out[:, 8:]), 0.0, atol=1e-7)


@pytest.mark.slow
def test_sigma_only_variant(setup):
    field, params, xyz, dirs, packed, xe, de = setup
    out = fm.fused_forward(packed, xe, de, fm.FusedSpec(sigma_only=True),
                           interpret=True)
    sigma_ref, _ = field.density(params, xyz)
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(sigma_ref),
                               atol=2e-3)


def test_pack_params_shapes(setup):
    _, params, _, _, packed, _, _ = setup
    assert packed["w0"].shape == (fm.XE_DIM, 256)
    assert packed["w4a"].shape == (fm.XE_DIM, 256)  # skip split: XE part
    assert packed["w4b"].shape == (256, 256)
    assert packed["wda"].shape == (256, 128)
    assert packed["wdb"].shape == (fm.DE_DIM, 128)
    assert packed["wsig"].shape == (256, fm.OUT_DIM)
    assert all(v.dtype == jnp.bfloat16 for k, v in packed.items()
               if k.startswith("w"))


def test_pad_batch():
    x = jnp.ones((100, 63))
    out = fm.pad_batch(x, fm.XE_DIM)
    assert out.shape == (fm.TILE, fm.XE_DIM)
    np.testing.assert_allclose(np.asarray(out[:100, :63]), 1.0)
    np.testing.assert_allclose(np.asarray(out[100:, :]), 0.0)
