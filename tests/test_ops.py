"""Hash-grid and SH encoder tests, incl. a numpy oracle of the reference
CUDA indexing math (restated from the spec in SURVEY §2.1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mirror_nerf_tpu.ops.hashgrid import (HashGridSpec, _corner_offsets,
                                          hashgrid_encode, init_hashgrid,
                                          tv_loss)
from mirror_nerf_tpu.ops.sh import sh_encode

PRIMES = np.array([1, 2654435761, 805459861], dtype=np.uint64)


def oracle_encode(table, x, spec):
    """Independent numpy restatement of gridencoder.cu forward semantics."""
    N = x.shape[0]
    out = np.zeros((N, spec.num_levels * spec.level_dim), np.float64)
    oob = ((x < 0) | (x > 1)).any(-1)
    for li, lv in enumerate(spec.levels()):
        scale = lv.scale
        pos = x * scale + 0.5
        pg = np.floor(pos).astype(np.int64)
        f = pos - pg
        acc = np.zeros((N, spec.level_dim), np.float64)
        side = lv.resolution + 1
        for c in range(8):
            bits = [(c >> d) & 1 for d in range(3)]
            cp = pg + np.array(bits)
            w = np.ones(N)
            for d in range(3):
                w *= f[:, d] if bits[d] else (1 - f[:, d])
            if lv.use_hash:
                h = np.zeros(N, np.uint64)
                for d in range(3):
                    h ^= (cp[:, d].astype(np.uint64) * PRIMES[d]) & 0xFFFFFFFF
                idx = (h & 0xFFFFFFFF) % lv.size
            else:
                idx = (cp[:, 0] + cp[:, 1] * side + cp[:, 2] * side * side
                       ) % lv.size
            acc += w[:, None] * table[lv.offset + idx]
        out[:, li * spec.level_dim:(li + 1) * spec.level_dim] = acc
    out[oob] = 0.0
    return out.astype(np.float32)


@pytest.fixture(scope="module")
def spec():
    return HashGridSpec(num_levels=6, level_dim=2, base_resolution=4,
                        log2_hashmap_size=8, per_level_scale=1.7)


@pytest.fixture(scope="module")
def table(spec):
    return init_hashgrid(jax.random.PRNGKey(0), spec) * 1e4  # O(1) values


class TestHashGrid:
    def test_level_layout(self, spec):
        lvls = spec.levels()
        assert len(lvls) == 6
        # level 0: res 4 -> dense 5^3=125 -> rounded to 128
        assert lvls[0].resolution == 4
        assert lvls[0].size == 128 and not lvls[0].use_hash
        # later levels exceed 2^8 and hash
        assert lvls[-1].use_hash
        assert lvls[-1].size == 256
        offsets = [l.offset for l in lvls]
        assert offsets == sorted(offsets)

    def test_desired_resolution_override(self):
        s = HashGridSpec(num_levels=16, base_resolution=16,
                         desired_resolution=2048)
        assert abs(s.scale_log2 - np.log2(2048 / 16) / 15) < 1e-12
        assert s.levels()[-1].resolution in (2048, 2049)

    def test_matches_numpy_oracle(self, spec, table):
        x = np.random.default_rng(0).uniform(0, 1, (64, 3)).astype(np.float32)
        ours = np.asarray(hashgrid_encode(table, jnp.asarray(x), spec))
        ref = oracle_encode(np.asarray(table), x, spec)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_out_of_bounds_is_zero(self, spec, table):
        x = jnp.array([[1.5, 0.5, 0.5], [-0.1, 0.2, 0.2]])
        out = np.asarray(hashgrid_encode(table, x, spec))
        np.testing.assert_array_equal(out, 0.0)

    def test_interpolation_exact_at_cell_centers(self):
        # align_corners=False, scale=res-1: x st. x*scale+0.5 integer hits one
        # table row exactly
        s = HashGridSpec(num_levels=1, level_dim=2, base_resolution=4,
                         log2_hashmap_size=10, per_level_scale=2.0)
        lv = s.levels()[0]
        t = jnp.arange(lv.size * 2, dtype=jnp.float32).reshape(lv.size, 2)
        # choose x so pos = x*scale + 0.5 = (2, 3, 1) exactly
        x = (jnp.array([[2.0, 3.0, 1.0]]) - 0.5) / lv.scale
        out = np.asarray(hashgrid_encode(t, x, s))
        side = lv.resolution + 1
        idx = (2 + 3 * side + 1 * side * side) % lv.size
        np.testing.assert_allclose(out[0], np.asarray(t[idx]), rtol=1e-5)

    def test_table_gradient_is_weighted_scatter(self):
        s = HashGridSpec(num_levels=1, level_dim=1, base_resolution=4,
                         log2_hashmap_size=10, per_level_scale=2.0)
        lv = s.levels()[0]
        t = jnp.zeros((lv.size, 1))
        x = jnp.array([[0.33, 0.71, 0.12]])

        g = jax.grad(lambda tt: jnp.sum(hashgrid_encode(tt, x, s)))(t)
        # gradients are the 8 interpolation weights; they sum to 1
        np.testing.assert_allclose(float(jnp.sum(g)), 1.0, rtol=1e-5)
        assert int(jnp.sum(g != 0)) <= 8

    def test_input_gradient_finite_difference(self, spec, table):
        x = jnp.asarray([[0.432, 0.618, 0.237]])

        def f(xx):
            return jnp.sum(hashgrid_encode(table, xx, spec))

        g = jax.grad(f)(x)
        eps = 1e-4
        for d in range(3):
            dx = jnp.zeros_like(x).at[0, d].set(eps)
            fd = (f(x + dx) - f(x - dx)) / (2 * eps)
            np.testing.assert_allclose(float(g[0, d]), float(fd), rtol=5e-2,
                                       atol=1e-3)

    def test_tv_loss_differentiable(self, spec, table):
        x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3))
        val, g = jax.value_and_grad(tv_loss)(table, x, spec)
        assert np.isfinite(float(val)) and float(val) >= 0
        assert np.isfinite(np.asarray(g)).all()


class TestSH:
    def test_dims(self):
        d = jnp.array([[0.0, 0.0, 1.0]])
        for deg in (1, 2, 3, 4):
            assert sh_encode(d, deg).shape == (1, deg ** 2)

    def test_known_values_at_z(self):
        out = np.asarray(sh_encode(jnp.array([[0.0, 0.0, 1.0]]), 4))[0]
        C0, C1 = 0.28209479177387814, 0.4886025119029199
        np.testing.assert_allclose(out[0], C0, rtol=1e-6)
        np.testing.assert_allclose(out[1:4], [0.0, C1, 0.0], atol=1e-7)
        # l=2, m=0 at z: 0.31539156... * 2
        np.testing.assert_allclose(out[6], 0.31539156525252005 * 2, rtol=1e-6)

    def test_orthonormality_monte_carlo(self):
        # E_sphere[Yi Yj] * 4π = δij
        rng = np.random.default_rng(0)
        v = rng.normal(size=(200000, 3))
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        Y = np.asarray(sh_encode(jnp.asarray(v, jnp.float32), 4))
        gram = (Y.T @ Y) / len(v) * 4 * np.pi
        np.testing.assert_allclose(gram, np.eye(16), atol=0.06)

    def test_degrees_5_to_8(self):
        """Recurrence path (deg>4) vs oracles, matching the reference CUDA
        table's convention (shencoder.cu: real SH, CS phase, index l²+l+m)."""
        rng = np.random.default_rng(1)
        d = rng.normal(size=(64, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        dj = jnp.asarray(d, jnp.float32)
        for deg in (5, 6, 7, 8):
            assert sh_encode(dj, deg).shape == (64, deg ** 2)
        out = np.asarray(sh_encode(dj, 8))
        # first 16 columns must equal the validated closed-form deg-4 basis
        np.testing.assert_allclose(out[:, :16], np.asarray(sh_encode(dj, 4)),
                                   atol=2e-6)
        # scipy oracle (sph_harm_y includes the CS phase) for every (l, m)
        from scipy.special import sph_harm_y

        x, y, z = d.T
        theta, phi = np.arccos(np.clip(z, -1, 1)), np.arctan2(y, x)
        for l in range(8):
            for m in range(0, l + 1):
                Y = sph_harm_y(l, m, theta, phi)
                base = l * l + l
                if m == 0:
                    np.testing.assert_allclose(out[:, base], Y.real,
                                               atol=5e-6)
                else:
                    s2 = np.sqrt(2)
                    np.testing.assert_allclose(out[:, base + m], s2 * Y.real,
                                               atol=5e-6)
                    np.testing.assert_allclose(out[:, base - m], s2 * Y.imag,
                                               atol=5e-6)

    def test_degree_8_differentiable(self):
        d = jnp.array([[0.3, -0.5, 0.81]])
        d = d / jnp.linalg.norm(d)
        g = jax.grad(lambda v: jnp.sum(sh_encode(v, 8) ** 2))(d)
        assert np.isfinite(np.asarray(g)).all()


class TestNGPField:
    def test_field_protocol_and_render(self, rng):
        from mirror_nerf_tpu.models.ngp import NGPField
        from mirror_nerf_tpu.render.renderer import RenderSettings, render_rays

        field = NGPField(bound=2.0)
        params = {"coarse": field.init(jax.random.PRNGKey(0)),
                  "fine": field.init(jax.random.PRNGKey(1))}
        x = jax.random.normal(jax.random.PRNGKey(2), (16, 3))
        sigma, geo = field.density(params["coarse"], x)
        assert sigma.shape == (16,) and geo.shape == (16, 15)
        n = 8
        o = jax.random.normal(jax.random.PRNGKey(3), (n, 3)) * 0.1
        d = jax.random.normal(jax.random.PRNGKey(4), (n, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        rays = jnp.concatenate(
            [o, d, jnp.full((n, 1), 0.05), jnp.full((n, 1), 3.0)], axis=1)
        rs = RenderSettings(N_samples=8, N_importance=8, noise_std=0.0,
                            compute_normal=True)
        out = render_rays(field, params, rays, rng, rs)
        assert out["rgb_fine"].shape == (n, 3)
        assert np.isfinite(np.asarray(out["rgb_fine"])).all()
        assert np.isfinite(np.asarray(out["normal_fine"])).all()

    def test_grad_flows_to_grid(self):
        from mirror_nerf_tpu.models.ngp import NGPField

        field = NGPField(bound=1.0)
        params = field.init(jax.random.PRNGKey(0))
        x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3), minval=-0.9,
                               maxval=0.9)

        def loss(p):
            sigma, _ = field.density(p, x)
            return jnp.sum(sigma ** 2)

        g = jax.grad(loss)(params)
        assert float(jnp.abs(g["grid"]).sum()) > 0


class TestEncoderFactory:
    def test_factory_dispatch(self):
        import jax

        from mirror_nerf_tpu.models.encoding import get_encoder

        enc, dim = get_encoder("None", input_dim=3)
        assert dim == 3
        enc, dim = get_encoder("frequency", multires=6)
        assert dim == 3 * (1 + 2 * 6)
        enc, dim = get_encoder("sphere_harmonics", degree=4)
        assert dim == 16
        d = jnp.array([[0.0, 0.0, 1.0]])
        assert enc(d).shape == (1, 16)
        enc, dim = get_encoder("hashgrid", num_levels=4, level_dim=2,
                               log2_hashmap_size=8, desired_resolution=64)
        assert dim == 8
        table = enc.init(jax.random.PRNGKey(0))
        out = enc(table, jnp.zeros((5, 3)), bound=1.0)
        assert out.shape == (5, 8)

    def test_tiled_gridtype_never_hashes(self):
        from mirror_nerf_tpu.models.encoding import get_encoder

        enc, _ = get_encoder("tiledgrid", num_levels=6, level_dim=2,
                             log2_hashmap_size=8, desired_resolution=128)
        assert all(not lv.use_hash for lv in enc.spec.levels())
