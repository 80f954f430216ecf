"""Native host runtime: builds, matches the numpy reference paths."""

import numpy as np
import pytest

from mirror_nerf_tpu import native
from mirror_nerf_tpu.core.rays import (get_ray_directions, get_rays,
                                       make_ray_buffer)


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no compiler)")
    return lib


def test_generate_rays_matches_numpy(lib):
    rng = np.random.default_rng(0)
    c2w = np.eye(4, dtype=np.float32)[:3]
    c2w[:3, :3] = np.linalg.qr(rng.normal(size=(3, 3)))[0].astype(np.float32)
    c2w[:, 3] = [0.3, -0.2, 1.1]
    H, W, focal = 37, 53, 41.5
    fast = native.generate_rays(c2w, H, W, focal, 0.05, 8.0)
    dirs = get_ray_directions(H, W, focal)
    o, d = get_rays(dirs, c2w)
    ref = make_ray_buffer(o, d, 0.05, 8.0)
    np.testing.assert_allclose(fast, ref, rtol=1e-5, atol=1e-6)


def test_gather_batch_matches_numpy(lib):
    rng = np.random.default_rng(1)
    n, k = 10000, 512
    rays = rng.normal(size=(n, 8)).astype(np.float32)
    rgbs = rng.normal(size=(n, 3)).astype(np.float32)
    masks = rng.normal(size=(n,)).astype(np.float32)
    idx = rng.integers(0, n, k)
    r, c, m = native.gather_batch(rays, rgbs, masks, idx)
    np.testing.assert_array_equal(r, rays[idx])
    np.testing.assert_array_equal(c, rgbs[idx])
    np.testing.assert_array_equal(m, masks[idx])


def test_blend_rgba_matches_numpy(lib):
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (5000, 4)).astype(np.uint8)
    rgb, valid = native.blend_rgba(img)
    f = img.astype(np.float32) / 255.0
    ref = f[:, :3] * f[:, 3:4] + (1.0 - f[:, 3:4])
    np.testing.assert_allclose(rgb, ref, atol=1e-6)
    np.testing.assert_array_equal(valid, img[:, 3] > 0)


def test_shuffle_is_permutation(lib):
    import ctypes

    idx = np.arange(1000, dtype=np.int64)
    lib.mn_shuffle_indices(
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(idx), 42)
    assert sorted(idx.tolist()) == list(range(1000))
    assert (idx != np.arange(1000)).any()
