"""Mesh extraction: iso-surface correctness on analytic fields + PLY IO."""

import os

import numpy as np
import pytest

from mirror_nerf_tpu.eval.mesh import (grid_to_world, largest_cluster,
                                       marching_tetrahedra, read_ply,
                                       vertex_normals, write_ply)


def _sphere_grid(n=48, r=0.6):
    lin = np.linspace(-1, 1, n)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    return r - np.sqrt(x ** 2 + y ** 2 + z ** 2), lin


class TestMarchingTetrahedra:
    def test_sphere_surface(self):
        n = 48
        vals, lin = _sphere_grid(n)
        verts, tris = marching_tetrahedra(vals, 0.0)
        assert len(verts) > 100 and len(tris) > 100
        # vertices lie on the r=0.6 sphere (in grid units -> world)
        world = verts / (n - 1) * 2 - 1
        radii = np.linalg.norm(world, axis=-1)
        np.testing.assert_allclose(radii, 0.6, atol=0.05)
        # triangle indices valid
        assert tris.min() >= 0 and tris.max() < len(verts)

    def test_empty_grid(self):
        vals = np.zeros((8, 8, 8))
        verts, tris = marching_tetrahedra(vals, 0.5)
        assert len(verts) == 0 and len(tris) == 0

    def test_normals_point_outward(self):
        n = 32
        vals, _ = _sphere_grid(n)
        verts, tris = marching_tetrahedra(vals, 0.0)
        vn = vertex_normals(verts, tris)
        center = (n - 1) / 2
        outward = verts - center
        outward /= np.linalg.norm(outward, axis=-1, keepdims=True)
        cos = (vn * outward).sum(-1)
        assert (cos > 0.5).mean() > 0.95  # overwhelmingly outward

    def test_largest_cluster_removes_noise(self):
        # two spheres: a big one and a small distant one
        n = 48
        lin = np.linspace(-1, 1, n)
        x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
        big = 0.45 - np.sqrt((x + 0.3) ** 2 + y ** 2 + z ** 2)
        small = 0.12 - np.sqrt((x - 0.7) ** 2 + (y - 0.7) ** 2 + z ** 2)
        vals = np.maximum(big, small)
        verts, tris = marching_tetrahedra(vals, 0.0)
        v2, t2 = largest_cluster(verts, tris)
        assert len(t2) < len(tris)
        # all kept vertices belong to the big sphere (x < 0.5 in world units)
        world_x = v2[:, 0] / (n - 1) * 2 - 1
        assert (world_x < 0.5).all()

    def test_grid_to_world_axis_swap(self):
        v = np.array([[10.0, 20.0, 30.0]])
        out = grid_to_world(v, 100, (-1, 1), (-2, 2), (0, 4))
        # axis0 of the grid is y (meshgrid default), axis1 is x
        np.testing.assert_allclose(out[0, 0], 2 * 0.2 - 1)  # from v[1]
        np.testing.assert_allclose(out[0, 1], 4 * 0.1 - 2)  # from v[0]
        np.testing.assert_allclose(out[0, 2], 4 * 0.3 + 0)


class TestPLY:
    def test_roundtrip_with_colors(self, tmp_path):
        verts = np.random.default_rng(0).normal(size=(10, 3)).astype(np.float32)
        tris = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
        colors = np.random.default_rng(1).integers(0, 255, (10, 3)).astype(
            np.uint8)
        p = str(tmp_path / "m.ply")
        write_ply(p, verts, tris, colors)
        v2, t2, c2 = read_ply(p)
        np.testing.assert_array_equal(v2, verts)
        np.testing.assert_array_equal(t2, tris)
        np.testing.assert_array_equal(c2, colors)


@pytest.mark.slow
def test_extract_mesh_cli(tmp_path):
    """End-to-end: a density field with a solid ball -> valid PLY files."""
    import jax
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
        __file__))))
    import extract_color_mesh as mesh_cli
    from mirror_nerf_tpu.data.synthetic import generate_scene
    from mirror_nerf_tpu.models.fields import MirrorNeRFField
    from mirror_nerf_tpu.train.checkpoints import save_pytree

    root = str(tmp_path / "scene")
    generate_scene(root, n_train=2, n_val=1, n_test=1, img_wh=(16, 16))

    field = MirrorNeRFField(predict_normal=True, predict_mirror_mask=True)
    params = {"coarse": field.init(jax.random.PRNGKey(0)),
              "fine": field.init(jax.random.PRNGKey(1))}
    # bias σ to ~30 so the random field crosses the threshold spatially —
    # a noisy but nonempty iso-surface for the structural test
    params["fine"]["sigma"]["b"] = params["fine"]["sigma"]["b"] + 30.0
    import jax.numpy as jnp

    params["fine"]["sigma"]["w"] = params["fine"]["sigma"]["w"] * 20.0
    ckpt = str(tmp_path / "w.npz")
    save_pytree(ckpt, params)

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        out = mesh_cli.main([
            "--root_dir", root, "--dataset_name", "blender",
            "--img_wh", "16", "16", "--N_samples", "8", "--N_importance", "8",
            "--chunk", "4096", "--N_grid", "24", "--sigma_threshold", "30.0",
            "--x_range", "-0.5", "0.5", "--y_range", "-0.5", "0.5",
            "--z_range", "-0.5", "0.5", "--ckpt_path", ckpt,
            "--predict_normal", "--predict_mirror_mask",
            "--exp_name", "mesh_t", "--use_vertex_normal", "--color_mesh",
        ])
        assert os.path.exists(os.path.join(out, "mesh_t.ply"))
        assert os.path.exists(os.path.join(out, "noise_free.ply"))
        colored = os.path.join(out, "mesh_t_colored.ply")
        assert os.path.exists(colored)
        v, t, c = read_ply(colored)
        assert len(v) > 0 and c is not None
    finally:
        os.chdir(cwd)
