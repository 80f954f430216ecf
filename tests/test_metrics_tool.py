"""tools/eval_metrics.py end-to-end on a synthetic render tree."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from mirror_nerf_tpu.eval.metrics import psnr, ssim  # noqa: E402


def test_ssim_identity_and_noise():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (32, 32, 3))
    assert ssim(img, img) == pytest.approx(1.0, abs=1e-6)
    noisy = np.clip(img + rng.normal(0, 0.2, img.shape), 0, 1)
    s = ssim(img, noisy)
    assert 0.0 < s < 0.9


def test_psnr_known_value():
    a = np.zeros((8, 8, 3))
    b = np.full((8, 8, 3), 0.1)
    assert psnr(a, b) == pytest.approx(20.0, abs=1e-6)


def test_eval_metrics_tool(tmp_path):
    import imageio.v2 as imageio

    from tools.eval_metrics import main

    root = tmp_path / "scene"
    res = tmp_path / "res"
    os.makedirs(root)
    os.makedirs(res)
    rng = np.random.default_rng(1)
    frames = []
    for i in range(2):
        img = (rng.uniform(0, 1, (16, 16, 3)) * 255).astype(np.uint8)
        imageio.imwrite(str(root / f"frame_{i}.png"), img)
        # render = gt + small noise
        noisy = np.clip(img.astype(int) + rng.integers(-10, 10, img.shape),
                        0, 255).astype(np.uint8)
        imageio.imwrite(str(res / f"rgb_fine_{i:03d}.png"), noisy)
        frames.append({"file_path": f"./frame_{i}",
                       "transform_matrix": np.eye(4).tolist()})
    with open(root / "transforms_test.json", "w") as f:
        json.dump({"camera_angle_x": 0.9, "frames": frames}, f)

    out = main(["--split_path", str(root / "transforms_test.json"),
                "--res_img_dir", str(res)])
    assert out["n"] == 2
    assert 25 < out["mean_psnr"] < 60
    assert 0.5 < out["mean_ssim"] <= 1.0
    assert np.isnan(out["mean_lpips"])  # no weights in this environment
