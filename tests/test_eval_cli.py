"""Eval driver + applications, end-to-end on the procedural scene."""

import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mirror_nerf_tpu.config import Config
from mirror_nerf_tpu.data.synthetic import generate_scene
from mirror_nerf_tpu.models.fields import MirrorNeRFField
from mirror_nerf_tpu.train.checkpoints import save_pytree


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scene_eval"))
    generate_scene(root, n_train=2, n_val=1, n_test=2, img_wh=(16, 16))
    return root


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    field = MirrorNeRFField(predict_normal=True, predict_mirror_mask=True)
    params = {"coarse": field.init(jax.random.PRNGKey(0)),
              "fine": field.init(jax.random.PRNGKey(1))}
    path = str(tmp_path_factory.mktemp("ck") / "weights.npz")
    save_pytree(path, params)
    return path


def _run_eval(scene, ckpt, tmp_path, extra=()):
    import eval as eval_cli

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        argv = [
            "--root_dir", scene, "--dataset_name", "blender",
            "--img_wh", "16", "16", "--N_samples", "8", "--N_importance", "8",
            "--near", "0.05", "--far", "12.0", "--chunk", "128",
            "--max_recursive_level", "2", "--ckpt_path", ckpt,
            "--predict_normal", "--predict_mirror_mask",
            "--trace_secondary_rays", "--exp_name", "t", "--split", "test",
            *extra,
        ]
        return eval_cli.main(argv), str(tmp_path)
    finally:
        os.chdir(cwd)


@pytest.mark.slow
def test_eval_nvs_output_tree(scene, ckpt, tmp_path):
    dir_name, base = _run_eval(scene, ckpt, tmp_path)
    out = os.path.join(base, dir_name)
    assert os.path.exists(os.path.join(out, "rgb_fine_000.png"))
    assert os.path.exists(os.path.join(out, "rgb_fine_001.png"))
    assert os.path.exists(os.path.join(out, "depth", "depth_fine_000.png"))
    assert os.path.exists(os.path.join(out, "mirror_mask",
                                       "mirror_mask_fine_000.png"))
    assert os.path.exists(os.path.join(out, "normal",
                                       "surface_normal_fine_000.png"))
    assert os.path.exists(os.path.join(out, "x_surface",
                                       "x_surface_fine_000.png"))
    assert os.path.exists(os.path.join(out, "t_rgb_fine.gif"))
    assert os.path.exists(os.path.join(
        out, "depth_unified_normalization", "depth_fine_001.png"))
    assert os.path.exists(os.path.join(out, "psnr.json"))


@pytest.mark.slow
def test_eval_fused_field_flag(scene, ckpt, tmp_path):
    """--fused_field routes eval through the Pallas kernels (interpret mode
    on CPU) and produces the same output tree."""
    dir_name, base = _run_eval(scene, ckpt, tmp_path,
                               extra=("--fused_field", "--only_eval_idx",
                                      "0"))
    out = os.path.join(base, dir_name)
    assert os.path.exists(os.path.join(out, "rgb_fine_000.png"))
    assert os.path.exists(os.path.join(out, "psnr.json"))


@pytest.mark.slow
def test_eval_fused_field_nerf_tpu(scene, tmp_path, tmp_path_factory):
    """eval CLI end-to-end with the CP-grid speed model + fused kernel."""
    import jax

    from mirror_nerf_tpu.models.tpugrid import TPUGridField

    field = TPUGridField(bound=6.0, predict_normal=True,
                         predict_mirror_mask=True)  # default levels: must
    # match what eval.py's make_field builds for --model_type nerf_tpu
    params = {"coarse": field.init(jax.random.PRNGKey(0)),
              "fine": field.init(jax.random.PRNGKey(1))}
    ckpt2 = str(tmp_path_factory.mktemp("ck_tpu") / "weights.npz")
    save_pytree(ckpt2, params)
    dir_name, base = _run_eval(
        scene, ckpt2, tmp_path,
        extra=("--fused_field", "--model_type", "nerf_tpu", "--bound", "6.0",
               "--only_eval_idx", "0"))
    out = os.path.join(base, dir_name)
    assert os.path.exists(os.path.join(out, "rgb_fine_000.png"))


@pytest.mark.slow
def test_eval_app_place_new_mirror(scene, ckpt, tmp_path):
    dir_name, base = _run_eval(
        scene, ckpt, tmp_path,
        extra=("--app_place_new_mirror", "--plane_pos", "plane_x",
               "--only_eval_idx", "0"))
    out = os.path.join(base, dir_name)
    assert os.path.exists(os.path.join(out, "rgb_fine_000.png"))


@pytest.mark.slow
def test_eval_app_roughness(scene, ckpt, tmp_path):
    dir_name, base = _run_eval(
        scene, ckpt, tmp_path,
        extra=("--app_control_mirror_roughness", "--trace_ray_times", "1",
               "--normal_noise_std", "0.01", "--only_eval_idx", "0"))
    out = os.path.join(base, dir_name)
    assert os.path.exists(os.path.join(out, "rgb_fine_000.png"))


@pytest.mark.slow
def test_eval_app_roughness_batched_matches_host_loop(scene, ckpt, tmp_path):
    """The single-dispatch lax.scan bundle render (default) must reproduce
    the sequential one-dispatch-per-bundle fallback exactly — same fold_in
    keys, same accumulation order."""
    from PIL import Image

    extra = ("--app_control_mirror_roughness", "--trace_ray_times", "2",
             "--normal_noise_std", "0.05", "--only_eval_idx", "0")
    (tmp_path / "batched").mkdir()
    (tmp_path / "host").mkdir()
    dir_b, base_b = _run_eval(scene, ckpt, tmp_path / "batched", extra=extra)
    os.environ["MNERF_ROUGHNESS_HOST_LOOP"] = "1"
    try:
        dir_h, base_h = _run_eval(scene, ckpt, tmp_path / "host", extra=extra)
    finally:
        del os.environ["MNERF_ROUGHNESS_HOST_LOOP"]
    a = np.asarray(Image.open(
        os.path.join(base_b, dir_b, "rgb_fine_000.png")), np.int16)
    b = np.asarray(Image.open(
        os.path.join(base_h, dir_h, "rgb_fine_000.png")), np.int16)
    # fp32 scan-order identical → at most quantization-boundary wobble
    assert np.abs(a - b).max() <= 1
    assert (a != b).mean() < 0.01


@pytest.mark.slow
def test_eval_app_substitution(scene, ckpt, tmp_path):
    dir_name, base = _run_eval(
        scene, ckpt, tmp_path,
        extra=("--app_reflection_substitution", "--substitution_ckpt_path",
               ckpt, "--only_eval_idx", "0"))
    out = os.path.join(base, dir_name)
    assert os.path.exists(os.path.join(out, "rgb_fine_000.png"))


def test_dnerf_field_renders():
    import jax.numpy as jnp

    from mirror_nerf_tpu.models.guests import DNeRFField, dnerf_render

    field = DNeRFField(depth=3, width=32, multires=4, multires_views=2,
                       skips=(1,))
    params = field.init(jax.random.PRNGKey(0))
    n = 8
    o = np.zeros((n, 3), np.float32)
    d = np.tile([[0, 0, 1]], (n, 1)).astype(np.float32)
    rays = jnp.asarray(np.concatenate(
        [o, d, np.full((n, 1), 2.0, np.float32),
         np.full((n, 1), 6.0, np.float32)], 1))
    for t in (0.0, 0.5):
        out = dnerf_render(field, params, rays, jnp.asarray(t),
                           jax.random.PRNGKey(1), N_samples=8, N_importance=4,
                           white_bkgd=True)
        assert out["rgb"].shape == (n, 3)
        assert np.isfinite(np.asarray(out["rgb"])).all()
        assert np.isfinite(np.asarray(out["depth"])).all()


@pytest.mark.slow
def test_eval_spmd_matches_single_device(scene, ckpt, tmp_path):
    """--num_gpus 8 shards eval chunks over the virtual CPU mesh (the
    reference's DDP-eval analog) and reproduces the single-device render."""
    import json

    (tmp_path / "one").mkdir()
    (tmp_path / "eight").mkdir()
    d1, b1 = _run_eval(scene, ckpt, tmp_path / "one",
                       extra=("--only_eval_idx", "0",))
    d8, b8 = _run_eval(scene, ckpt, tmp_path / "eight",
                       extra=("--only_eval_idx", "0", "--num_gpus", "8"))
    import imageio.v2 as imageio

    a = imageio.imread(os.path.join(b1, d1, "rgb_fine_000.png"))
    b = imageio.imread(os.path.join(b8, d8, "rgb_fine_000.png"))
    np.testing.assert_allclose(a.astype(np.float32), b.astype(np.float32),
                               atol=1.0)  # 8-bit quantization slack
    p1 = json.load(open(os.path.join(b1, d1, "psnr.json")))
    p8 = json.load(open(os.path.join(b8, d8, "psnr.json")))
    assert abs(p1["mean_psnr"] - p8["mean_psnr"]) < 1e-3


@pytest.mark.slow
def test_eval_proposal_skip_flag(scene, ckpt, tmp_path):
    """--proposal_skip renders the full output tree with no coarse pass
    (round-4 lever; renderer-level semantics in
    test_field_and_renderer.TestProposalSkip)."""
    dir_name, base = _run_eval(scene, ckpt, tmp_path,
                               extra=("--proposal_skip",))
    out = os.path.join(base, dir_name)
    assert os.path.exists(os.path.join(out, "rgb_fine_000.png"))
    assert os.path.exists(os.path.join(out, "psnr.json"))


@pytest.mark.slow
def test_eval_proposal_skip_rejects_coarse_rgb(scene, ckpt, tmp_path):
    with pytest.raises(ValueError, match="proposal_skip"):
        _run_eval(scene, ckpt, tmp_path,
                  extra=("--proposal_skip", "--render_coarse_rgb"))


@pytest.mark.slow
def test_eval_secondary_budget_flags(scene, ckpt, tmp_path):
    """--secondary_N_samples/_importance: reduced bounce budget through the
    CLI. Direct (level-0) outputs are untouched; psnr.json still appears."""
    import json

    dir_name, base = _run_eval(scene, ckpt, tmp_path,
                               extra=("--secondary_N_samples", "4",
                                      "--secondary_N_importance", "4",
                                      "--only_eval_idx", "0"))
    out = os.path.join(base, dir_name)
    assert os.path.exists(os.path.join(out, "rgb_fine_000.png"))
    with open(os.path.join(out, "psnr.json")) as f:
        m = json.load(f)
    assert np.isfinite(m["mean_psnr"])
