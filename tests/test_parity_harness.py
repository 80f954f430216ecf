"""One-command parity harness end-to-end on the procedural scene.

The real use is reference scenes + published torch checkpoints (imported by
the ckpt shim); here we drive the identical code path with the synthetic
scene and an npz checkpoint, including the reference-results delta mode
(using the scene's own GT images as stand-in "reference renders", which must
give delta = ours − perfect ≤ 0 in PSNR terms).
"""

import json
import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mirror_nerf_tpu.data.synthetic import generate_scene
from mirror_nerf_tpu.models.fields import MirrorNeRFField
from mirror_nerf_tpu.train.checkpoints import save_pytree


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scene_parity"))
    generate_scene(root, n_train=2, n_val=1, n_test=2, img_wh=(16, 16))
    return root


@pytest.mark.slow
def test_parity_harness_end_to_end(scene, tmp_path):
    from tools.parity_check import main as parity_main

    field = MirrorNeRFField(predict_normal=True, predict_mirror_mask=True)
    params = {"coarse": field.init(jax.random.PRNGKey(0)),
              "fine": field.init(jax.random.PRNGKey(1))}
    ckpt = str(tmp_path / "weights.npz")
    save_pytree(ckpt, params)

    # stand-in "reference renders": the GT test images themselves
    ref_dir = tmp_path / "ref_renders"
    ref_dir.mkdir()
    with open(os.path.join(scene, "transforms_test.json")) as f:
        meta = json.load(f)
    from PIL import Image

    for idx, frame in enumerate(meta["frames"]):
        src = os.path.join(scene, f"{frame['file_path']}.png")
        Image.open(src).convert("RGB").save(
            str(ref_dir / f"rgb_fine_{idx:03d}.png"))

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        result = parity_main([
            "--scene_dir", scene, "--ckpt", ckpt, "--img_wh", "16", "16",
            "--ref_results", str(ref_dir),
            "--out", str(tmp_path / "parity.json"),
            "--",
            "--N_samples", "8", "--N_importance", "8", "--near", "0.05",
            "--far", "12.0", "--chunk", "128", "--max_recursive_level", "1",
        ])
    finally:
        os.chdir(cwd)

    assert result["n_views"] == 2
    assert np.isfinite(result["ours"]["psnr"])
    assert np.isfinite(result["ours"]["ssim"])
    # untrained params render noise: PSNR must be low but finite
    assert 0.0 < result["ours"]["psnr"] < 30.0
    # the stand-in reference is pixel-perfect GT -> its PSNR is inf-like
    # (capped by the metric impl) and the delta is negative
    assert result["delta"]["psnr"] < 0
    with open(tmp_path / "parity.json") as f:
        saved = json.load(f)
    assert saved["ours"]["psnr"] == result["ours"]["psnr"]
