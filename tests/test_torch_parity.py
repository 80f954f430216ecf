"""Golden parity test against a torch re-statement of the reference model.

Builds the reference MirrorNeRF architecture in torch *from its published
spec* (8x256 trunk with skip at 4, raw-σ head, view-conditioned rgb head,
2-linear normal head, LeakyReLU mirror head — models/mirror_nerf.py:41-99),
exports a Lightning-style state dict, imports it through our torch-ckpt shim,
and checks our field reproduces the torch forward to float32 precision.
This validates both the architecture and the published-checkpoint loader.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from mirror_nerf_tpu.models.fields import MirrorNeRFField  # noqa: E402
from mirror_nerf_tpu.train.checkpoints import (  # noqa: E402
    torch_mirror_nerf_to_params,
)

D, W = 4, 64  # smaller than the real 8x256 for test speed; same topology
N_XYZ, N_DIR = 4, 2
IN_XYZ = 3 + 3 * 2 * N_XYZ
IN_DIR = 3 + 3 * 2 * N_DIR
SKIPS = [2]


class TorchRef(torch.nn.Module):
    """Reference architecture, restated from the spec."""

    def __init__(self):
        super().__init__()
        for i in range(D):
            in_dim = IN_XYZ if i == 0 else (
                W + IN_XYZ if i in SKIPS else W)
            layer = torch.nn.Sequential(torch.nn.Linear(in_dim, W),
                                        torch.nn.ReLU(True))
            setattr(self, f"xyz_encoding_{i + 1}", layer)
        self.xyz_encoding_final = torch.nn.Linear(W, W)
        self.dir_encoding = torch.nn.Sequential(
            torch.nn.Linear(W + IN_DIR, W // 2), torch.nn.ReLU(True))
        self.sigma = torch.nn.Linear(W, 1)
        self.rgb = torch.nn.Sequential(torch.nn.Linear(W // 2, 3),
                                       torch.nn.Sigmoid())
        self.normal_net = torch.nn.Sequential(
            torch.nn.Linear(W, W // 2), torch.nn.Linear(W // 2, 3))
        self.is_mirror_net = torch.nn.Sequential(
            torch.nn.Linear(W, W // 2), torch.nn.LeakyReLU(inplace=True),
            torch.nn.Linear(W // 2, 1), torch.nn.Sigmoid())

    @staticmethod
    def embed(x, n):
        out = [x]
        for k in range(n):
            f = 2.0 ** k
            out += [torch.sin(f * x), torch.cos(f * x)]
        return torch.cat(out, -1)

    def density(self, xyz):
        h0 = self.embed(xyz, N_XYZ)
        h = h0
        for i in range(D):
            if i in SKIPS:
                h = torch.cat([h0, h], -1)
            h = getattr(self, f"xyz_encoding_{i + 1}")(h)
        return self.sigma(h)[..., 0], h

    def color(self, geo, dirs):
        d = self.embed(dirs, N_DIR)
        h = self.xyz_encoding_final(geo)
        h = self.dir_encoding(torch.cat([h, d], -1))
        return self.rgb(h)


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    ref = TorchRef().eval()
    sd = {f"nerf_fine.{k}": v for k, v in ref.state_dict().items()}
    params = torch_mirror_nerf_to_params(sd, "nerf_fine", depth=D)
    field = MirrorNeRFField(N_emb_xyz=N_XYZ, N_emb_dir=N_DIR, depth=D,
                            width=W, skips=tuple(SKIPS))
    return ref, field, params


def test_density_parity(pair):
    ref, field, params = pair
    x = np.random.default_rng(0).normal(size=(64, 3)).astype(np.float32)
    with torch.no_grad():
        sig_t, geo_t = ref.density(torch.from_numpy(x))
    sig_j, geo_j = field.density(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(sig_j), sig_t.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(geo_j), geo_t.numpy(), atol=2e-5)


def test_color_parity(pair):
    ref, field, params = pair
    rng = np.random.default_rng(1)
    x = rng.normal(size=(32, 3)).astype(np.float32)
    d = rng.normal(size=(32, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    with torch.no_grad():
        _, geo_t = ref.density(torch.from_numpy(x))
        rgb_t = ref.color(geo_t, torch.from_numpy(d))
    _, geo_j = field.density(params, jnp.asarray(x))
    rgb_j = field.color(params, geo_j, jnp.asarray(d))
    np.testing.assert_allclose(np.asarray(rgb_j), rgb_t.numpy(), atol=2e-5)


def test_heads_parity(pair):
    ref, field, params = pair
    x = np.random.default_rng(2).normal(size=(32, 3)).astype(np.float32)
    with torch.no_grad():
        _, geo_t = ref.density(torch.from_numpy(x))
        n_t = ref.normal_net(geo_t)
        m_t = ref.is_mirror_net(geo_t)[..., 0]
    _, geo_j = field.density(params, jnp.asarray(x))
    n_j = field.normal_head(params, geo_j)  # unnormalized head output
    m_j = field.mirror_head(params, geo_j)
    np.testing.assert_allclose(np.asarray(n_j), n_t.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(m_j), m_t.numpy(), atol=2e-5)


@pytest.mark.slow
def test_full_size_checkpoint_mapping():
    """The real published-checkpoint dimensions: 8x256 trunk, emb 10/4."""
    import torch.nn as tnn

    torch.manual_seed(1)
    D_, W_ = 8, 256
    IN_X, IN_D = 63, 27

    class FullRef(torch.nn.Module):
        def __init__(self):
            super().__init__()
            for i in range(D_):
                in_dim = IN_X if i == 0 else (W_ + IN_X if i == 4 else W_)
                setattr(self, f"xyz_encoding_{i + 1}",
                        tnn.Sequential(tnn.Linear(in_dim, W_), tnn.ReLU(True)))
            self.xyz_encoding_final = tnn.Linear(W_, W_)
            self.dir_encoding = tnn.Sequential(
                tnn.Linear(W_ + IN_D, W_ // 2), tnn.ReLU(True))
            self.sigma = tnn.Linear(W_, 1)
            self.rgb = tnn.Sequential(tnn.Linear(W_ // 2, 3), tnn.Sigmoid())
            self.normal_net = tnn.Sequential(
                tnn.Linear(W_, W_ // 2), tnn.Linear(W_ // 2, 3))
            self.is_mirror_net = tnn.Sequential(
                tnn.Linear(W_, W_ // 2), tnn.LeakyReLU(inplace=True),
                tnn.Linear(W_ // 2, 1), tnn.Sigmoid())

        def density(self, xyz):
            h0 = TorchRef.embed(xyz, 10)
            h = h0
            for i in range(D_):
                if i == 4:
                    h = torch.cat([h0, h], -1)
                h = getattr(self, f"xyz_encoding_{i + 1}")(h)
            return self.sigma(h)[..., 0], h

    ref = FullRef().eval()
    sd = {f"nerf_coarse.{k}": v for k, v in ref.state_dict().items()}
    params = torch_mirror_nerf_to_params(sd, "nerf_coarse", depth=D_)
    field = MirrorNeRFField()  # defaults = published architecture
    x = np.random.default_rng(7).normal(size=(16, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        sig_t, geo_t = ref.density(torch.from_numpy(x))
        m_t = ref.is_mirror_net(geo_t)[..., 0]
    sig_j, geo_j = field.density(params, jnp.asarray(x))
    m_j = field.mirror_head(params, geo_j)
    np.testing.assert_allclose(np.asarray(sig_j), sig_t.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(m_j), m_t.numpy(), atol=1e-4)
