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


class TestLPIPSJax:
    """jnp LPIPS(alex) forward vs a torch oracle built from the same
    (synthesized) weights — validates the architecture without pretrained
    data (ref tools/eval_metrics.py:25-32)."""

    @staticmethod
    def _synth_weights(seed=0):
        import numpy as np

        rng = np.random.default_rng(seed)
        specs = [(64, 3, 11), (192, 64, 5), (384, 192, 3),
                 (256, 384, 3), (256, 256, 3)]
        w = {}
        for i, (o, c, k) in enumerate(specs):
            w[f"conv{i}/w"] = rng.normal(0, 0.08, (o, c, k, k)).astype("f4")
            w[f"conv{i}/b"] = rng.normal(0, 0.05, (o,)).astype("f4")
        for i, o in enumerate([64, 192, 384, 256, 256]):
            w[f"lin{i}/w"] = rng.uniform(0, 0.1, (o,)).astype("f4")
        return w

    @staticmethod
    def _torch_oracle(w, im0, im1):
        import numpy as np
        import torch
        import torch.nn.functional as F

        shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
        scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

        def feats(img):
            x = torch.from_numpy(
                np.asarray(img, "f4").transpose(2, 0, 1)[None]) * 2 - 1
            h = (x - shift) / scale
            taps = []
            cfg = [(4, 2), (1, 2), (1, 1), (1, 1), (1, 1)]
            for i, (s, p) in enumerate(cfg):
                if i in (1, 2):
                    h = F.max_pool2d(h, 3, stride=2)
                h = F.conv2d(h, torch.from_numpy(w[f"conv{i}/w"]),
                             torch.from_numpy(w[f"conv{i}/b"]),
                             stride=s, padding=p)
                h = F.relu(h)
                taps.append(h)
            return taps

        with torch.no_grad():
            t0, t1 = feats(im0), feats(im1)
            total = 0.0
            for i, (f0, f1) in enumerate(zip(t0, t1)):
                n0 = f0 / (f0.pow(2).sum(1, keepdim=True) + 1e-10).sqrt()
                n1 = f1 / (f1.pow(2).sum(1, keepdim=True) + 1e-10).sqrt()
                lin = torch.from_numpy(w[f"lin{i}/w"]).view(1, -1, 1, 1)
                total += ((n0 - n1).pow(2) * lin).sum(1).mean()
            return float(total)

    def test_matches_torch_oracle(self):
        import numpy as np

        from mirror_nerf_tpu.eval.lpips_jax import lpips_forward

        rng = np.random.default_rng(1)
        w = self._synth_weights()
        im0 = rng.uniform(size=(64, 64, 3)).astype("f4")
        im1 = np.clip(im0 + rng.normal(0, 0.1, im0.shape), 0, 1).astype("f4")
        ours = lpips_forward(w, im0, im1)
        ref = self._torch_oracle(w, im0, im1)
        assert abs(ours - ref) < 1e-4 * max(abs(ref), 1e-3), (ours, ref)
        assert ours > 0
        assert abs(lpips_forward(w, im0, im0)) < 1e-7

    def test_npz_and_torch_statedict_formats(self, tmp_path):
        import numpy as np
        import torch

        from mirror_nerf_tpu.eval.lpips_jax import lpips_from_file

        w = self._synth_weights()
        rng = np.random.default_rng(2)
        im0 = rng.uniform(size=(64, 64, 3)).astype("f4")
        im1 = rng.uniform(size=(64, 64, 3)).astype("f4")

        npz = str(tmp_path / "lpips.npz")
        np.savez(npz, **w)
        v_npz = lpips_from_file(im0, im1, npz)

        feat_idx = (0, 3, 6, 8, 10)
        sd = {}
        for i, fi in enumerate(feat_idx):
            sd[f"net.slice.features.{fi}.weight"] = torch.from_numpy(
                w[f"conv{i}/w"])
            sd[f"net.slice.features.{fi}.bias"] = torch.from_numpy(
                w[f"conv{i}/b"])
        for i in range(5):
            sd[f"lin{i}.model.1.weight"] = torch.from_numpy(
                w[f"lin{i}/w"].reshape(1, -1, 1, 1))
        pt = str(tmp_path / "lpips.pth")
        torch.save(sd, pt)
        v_pt = lpips_from_file(im0, im1, pt)

        assert np.isfinite(v_npz) and abs(v_npz - v_pt) < 1e-6

    def test_tool_prints_lpips_with_weights(self, tmp_path):
        import numpy as np

        from mirror_nerf_tpu.eval.metrics import lpips

        w = self._synth_weights()
        npz = str(tmp_path / "lpips.npz")
        np.savez(npz, **w)
        rng = np.random.default_rng(3)
        im = rng.uniform(size=(64, 64, 3)).astype("f4")
        assert np.isfinite(lpips(im, 1 - im, weights_path=npz))
        assert np.isnan(lpips(im, im, weights_path=None))

    def test_converter_roundtrip(self, tmp_path):
        """tools/convert_lpips_weights.py: two torch state-dict files
        (AlexNet features + lpips lins, the shape of the published
        artifacts) -> canonical npz that lpips_from_file consumes."""
        import numpy as np
        import torch

        from mirror_nerf_tpu.eval.lpips_jax import lpips_forward, lpips_from_file
        from tools.convert_lpips_weights import convert

        w = self._synth_weights(seed=4)
        feat_idx = (0, 3, 6, 8, 10)
        alex_sd = {}
        for i, fi in enumerate(feat_idx):
            alex_sd[f"features.{fi}.weight"] = torch.from_numpy(w[f"conv{i}/w"])
            alex_sd[f"features.{fi}.bias"] = torch.from_numpy(w[f"conv{i}/b"])
        lins_sd = {f"lin{i}.model.1.weight":
                   torch.from_numpy(w[f"lin{i}/w"].reshape(1, -1, 1, 1))
                   for i in range(5)}
        f_alex = str(tmp_path / "alexnet.pth")
        f_lins = str(tmp_path / "alex_lins.pth")
        torch.save(alex_sd, f_alex)
        torch.save(lins_sd, f_lins)

        out = str(tmp_path / "lpips_alex.npz")
        converted = convert([f_alex, f_lins], out)
        for k, v in w.items():
            np.testing.assert_array_equal(converted[k], v)

        rng = np.random.default_rng(5)
        im0 = rng.uniform(size=(64, 64, 3)).astype("f4")
        im1 = rng.uniform(size=(64, 64, 3)).astype("f4")
        v_file = lpips_from_file(im0, im1, out)
        v_direct = lpips_forward(w, im0, im1)
        assert np.isfinite(v_file) and abs(v_file - v_direct) < 1e-6

    def test_converter_rejects_bad_shapes(self, tmp_path):
        import numpy as np
        import pytest
        import torch

        from tools.convert_lpips_weights import convert

        w = self._synth_weights(seed=6)
        sd = {}
        for i, fi in enumerate((0, 3, 6, 8, 10)):
            sd[f"features.{fi}.weight"] = torch.from_numpy(w[f"conv{i}/w"])
            sd[f"features.{fi}.bias"] = torch.from_numpy(w[f"conv{i}/b"])
        for i in range(5):
            sd[f"lin{i}.model.1.weight"] = torch.from_numpy(
                w[f"lin{i}/w"].reshape(1, -1, 1, 1))
        sd["features.0.weight"] = torch.zeros(64, 3, 7, 7)  # wrong kernel
        f = str(tmp_path / "bad.pth")
        torch.save(sd, f)
        with pytest.raises(ValueError, match="conv0/w shape"):
            convert([f], str(tmp_path / "out.npz"))
