"""Golden parity tests: our losses vs a torch restatement of the reference
loss definitions (losses.py), on random inputs covering every branch."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402
import jax  # noqa: E402

from mirror_nerf_tpu.train.losses import (LossSettings, color_loss,  # noqa: E402
                                          mirror_mask_loss, normal_loss,
                                          normal_reg_loss)

N, S = 64, 8


def _batch(mask_kind="valid", seed=0):
    rng = np.random.default_rng(seed)
    rgbs = rng.uniform(0, 1, (N, 3)).astype(np.float32)
    rays = rng.normal(size=(N, 8)).astype(np.float32)
    if mask_kind == "valid":
        mask = (rng.uniform(size=N) > 0.6).astype(np.float32)
        mask[:4] = 1.0  # ensure both classes present
        mask[4:8] = 0.0
    else:
        mask = np.full(N, -1.0, np.float32)
    return {"rgbs": rgbs, "rays": rays, "mirror_mask": mask}


def _results(seed=1):
    rng = np.random.default_rng(seed)
    out = {}
    for typ in ("coarse", "fine"):
        out[f"rgb_{typ}"] = rng.uniform(0, 1, (N, 3)).astype(np.float32)
        out[f"mirror_mask_{typ}"] = rng.uniform(0, 1, N).astype(np.float32)
        out[f"normal_dif_{typ}"] = rng.uniform(0, 2, N).astype(np.float32)
        out[f"pred_normal_{typ}"] = rng.normal(size=(N, S, 3)).astype(
            np.float32)
        out[f"weights_{typ}"] = rng.uniform(0, 0.2, (N, S)).astype(np.float32)
    out["normal_fine"] = rng.normal(size=(N, S, 3)).astype(np.float32)
    return out


def _j(results, batch, **ls_kw):
    ls = LossSettings(**ls_kw)
    jr = {k: jnp.asarray(v) for k, v in results.items()}
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    return ls, jr, jb


class TestColorLoss:
    def _torch_plain(self, results, batch):
        t = torch.from_numpy(batch["rgbs"])
        loss = 0
        for typ in ("coarse", "fine"):
            p = torch.from_numpy(results[f"rgb_{typ}"])
            loss = loss + torch.nn.functional.mse_loss(p, t)
        return float(loss)

    def test_plain(self):
        results, batch = _results(), _batch()
        ls, jr, jb = _j(results, batch, train_geometry_stage=False)
        ours = float(color_loss(ls, jr, jb))
        np.testing.assert_allclose(ours, self._torch_plain(results, batch),
                                   rtol=1e-5)

    def test_geometry_stage_invalid_mask_uses_pred_mask(self):
        results, batch = _results(), _batch(mask_kind="invalid")
        ls, jr, jb = _j(results, batch, train_geometry_stage=True)
        ours = float(color_loss(ls, jr, jb))
        # torch restatement: exclude thresholded predicted-fine-mask pixels
        pm = results["mirror_mask_fine"] > 0.5
        t = torch.from_numpy(batch["rgbs"])
        loss = 0
        for typ in ("coarse", "fine"):
            p = torch.from_numpy(results[f"rgb_{typ}"])
            loss = loss + torch.nn.functional.mse_loss(p[~pm], t[~pm])
        np.testing.assert_allclose(ours, float(loss), rtol=1e-5)

    def test_geometry_stage_womask_excludes_gt_mirror(self):
        results, batch = _results(), _batch(mask_kind="valid")
        ls, jr, jb = _j(results, batch, train_geometry_stage=True,
                        woMaskRGBtoBlack=True)
        ours = float(color_loss(ls, jr, jb))
        gm = batch["mirror_mask"] > 0.5
        t = torch.from_numpy(batch["rgbs"])
        loss = 0
        for typ in ("coarse", "fine"):
            p = torch.from_numpy(results[f"rgb_{typ}"])
            loss = loss + torch.nn.functional.mse_loss(
                p[~gm], t[~gm])
        np.testing.assert_allclose(ours, float(loss), rtol=1e-5)


class TestNormalLoss:
    def test_valid_mask_inside_x100(self):
        results, batch = _results(), _batch()
        ls, jr, jb = _j(results, batch)
        ours = float(normal_loss(ls, jr, jb) / ls.normal_loss_weight)
        m = batch["mirror_mask"] > 0.5
        ref = 0.0
        for typ in ("coarse", "fine"):
            d = results[f"normal_dif_{typ}"]
            ref += d[~m].mean() + d[m].mean() * 100
        np.testing.assert_allclose(ours, ref, rtol=1e-5)

    def test_invalid_mask_plain_mean(self):
        results, batch = _results(), _batch(mask_kind="invalid")
        ls, jr, jb = _j(results, batch)
        ours = float(normal_loss(ls, jr, jb) / ls.normal_loss_weight)
        ref = sum(results[f"normal_dif_{t}"].mean() for t in ("coarse",
                                                              "fine"))
        np.testing.assert_allclose(ours, ref, rtol=1e-5)


class TestMirrorMaskLoss:
    def test_bce_masked_to_valid(self):
        results, batch = _results(), _batch()
        batch["mirror_mask"][::7] = -1.0  # some invalid pixels
        ls, jr, jb = _j(results, batch)
        ours = float(mirror_mask_loss(ls, jr, jb) / ls.mirror_mask_loss_weight)
        gt = torch.from_numpy(batch["mirror_mask"])
        valid = (gt >= 0).float()
        ref = 0.0
        for typ in ("coarse", "fine"):
            p = torch.from_numpy(results[f"mirror_mask_{typ}"]).clamp(
                1e-7, 1 - 1e-7)
            bce = -(gt * torch.log(p) + (1 - gt) * torch.log(1 - p))
            ref += float((bce * valid).mean())
        np.testing.assert_allclose(ours, ref, rtol=1e-4)


class TestNormalRegLoss:
    def test_penalty_matches(self):
        results, batch = _results(), _batch()
        ls, jr, jb = _j(results, batch)
        ours = float(normal_reg_loss(ls, jr, jb)
                     / ls.normal_reg_loss_weight)
        rays_d = torch.from_numpy(batch["rays"][:, 3:6])
        ref = 0.0
        for typ in ("coarse", "fine"):
            n = torch.from_numpy(results[f"pred_normal_{typ}"])
            w = torch.from_numpy(results[f"weights_{typ}"])
            ref += float((torch.relu(n * rays_d[:, None, :]).sum(-1) * w)
                         .mean())
        n = torch.from_numpy(results["normal_fine"])
        w = torch.from_numpy(results["weights_fine"])
        ref += float((torch.relu(n * rays_d[:, None, :]).sum(-1) * w).mean())
        np.testing.assert_allclose(ours, ref, rtol=1e-5)


class TestDistortionLoss:
    """Opt-in mip-NeRF 360 distortion prior (not in the reference)."""

    def _inputs(self, seed=3):
        rng = np.random.default_rng(seed)
        w = rng.uniform(0, 0.2, (N, S)).astype(np.float32)
        z = np.sort(rng.uniform(0.1, 4.0, (N, S)).astype(np.float32), axis=1)
        return w, z

    def test_cumsum_formula_matches_pairwise_oracle(self):
        from mirror_nerf_tpu.train.losses import distortion_loss

        w, z = self._inputs()
        ls = LossSettings(distortion_loss_weight=1.0)
        ours = float(distortion_loss(
            ls, {"weights_fine": jnp.asarray(w), "z_vals_fine": jnp.asarray(z)}))
        # O(S^2) oracle on normalized coordinates
        s = (z - z[:, :1]) / np.maximum(z[:, -1:] - z[:, :1], 1e-8)
        bi = np.einsum("ni,nj,nij->n", w, w, np.abs(s[:, :, None] - s[:, None, :]))
        delta = np.diff(s, axis=1, append=s[:, -1:])
        intra = (w * w * delta).sum(1) / 3.0
        np.testing.assert_allclose(ours, float((bi + intra).mean()), rtol=1e-5)

    def test_concentrated_weights_score_lower(self):
        from mirror_nerf_tpu.train.losses import distortion_loss

        _, z = self._inputs()
        ls = LossSettings(distortion_loss_weight=1.0)
        spread = np.full((N, S), 1.0 / S, np.float32)
        peaked = np.zeros((N, S), np.float32)
        peaked[:, S // 2] = 1.0
        zs = jnp.asarray(z)
        l_spread = float(distortion_loss(
            ls, {"weights_fine": jnp.asarray(spread), "z_vals_fine": zs}))
        l_peaked = float(distortion_loss(
            ls, {"weights_fine": jnp.asarray(peaked), "z_vals_fine": zs}))
        assert l_peaked < l_spread * 0.2

    def test_schedule_wiring(self):
        """total_loss includes the term iff the weight is positive."""
        from mirror_nerf_tpu.train.losses import total_loss

        w, z = self._inputs()
        results, batch = _results(), _batch()
        results["weights_fine"] = w
        results["z_vals_fine"] = z
        for weight, expect in ((0.0, False), (0.01, True)):
            ls, jr, jb = _j(results, batch, distortion_loss_weight=weight)
            _, comps = total_loss(ls, jr, jb, jax.random.PRNGKey(0))
            assert ("distortion_loss" in comps) == expect
