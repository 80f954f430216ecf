"""D-NeRF guest parity: our DNeRFField vs a torch restatement of
DirectTemporalNeRF (run_dnerf_helpers.py:70-253), incl. the .tar checkpoint
key mapping."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from mirror_nerf_tpu.models.guests import (DNeRFField,  # noqa: E402
                                           dnerf_params_from_torch)

D, W = 4, 32
MULTIRES, MULTIRES_VIEWS = 4, 2
SKIPS = [2]
IN_PTS = 3 * (1 + 2 * MULTIRES)
IN_VIEWS = 3 * (1 + 2 * MULTIRES_VIEWS)
IN_TIME = 1 * (1 + 2 * MULTIRES)


def embed(x, n):
    out = [x]
    for k in range(n):
        f = 2.0 ** k
        out += [torch.sin(f * x), torch.cos(f * x)]
    return torch.cat(out, -1)


class TorchCanonical(nn.Module):
    """NeRFOriginal restated (use_viewdirs branch)."""

    def __init__(self):
        super().__init__()
        layers = [nn.Linear(IN_PTS, W)]
        for i in range(D - 1):
            layers.append(nn.Linear(W + (IN_PTS if i in SKIPS else 0), W))
        self.pts_linears = nn.ModuleList(layers)
        self.views_linears = nn.ModuleList([nn.Linear(IN_VIEWS + W, W // 2)])
        self.feature_linear = nn.Linear(W, W)
        self.alpha_linear = nn.Linear(W, 1)
        self.rgb_linear = nn.Linear(W // 2, 3)

    def forward(self, pts_emb, views_emb):
        h = pts_emb
        for i, layer in enumerate(self.pts_linears):
            h = F.relu(layer(h))
            if i in SKIPS:
                h = torch.cat([pts_emb, h], -1)
        alpha = self.alpha_linear(h)
        feat = self.feature_linear(h)
        hv = F.relu(self.views_linears[0](torch.cat([feat, views_emb], -1)))
        rgb = self.rgb_linear(hv)
        return torch.cat([rgb, alpha], -1)


class TorchDNeRF(nn.Module):
    def __init__(self):
        super().__init__()
        self._occ = TorchCanonical()
        layers = [nn.Linear(IN_PTS + IN_TIME, W)]
        for i in range(D - 1):
            layers.append(nn.Linear(W + (IN_PTS if i in SKIPS else 0), W))
        self._time = nn.ModuleList(layers)
        self._time_out = nn.Linear(W, 3)

    def query_time(self, pts_emb, t_emb):
        h = torch.cat([pts_emb, t_emb], -1)
        for i, layer in enumerate(self._time):
            h = F.relu(layer(h))
            if i in SKIPS:
                h = torch.cat([pts_emb, h], -1)
        return self._time_out(h)

    def forward(self, xyz, dirs, t):
        pts_emb = embed(xyz, MULTIRES)
        t_col = torch.full_like(xyz[:, :1], t)
        t_emb = embed(t_col, MULTIRES)
        if t == 0.0:
            dx = torch.zeros_like(xyz)
        else:
            dx = self.query_time(pts_emb, t_emb)
        new_emb = embed(xyz + dx, MULTIRES)
        return self._occ(new_emb, embed(dirs, MULTIRES_VIEWS))


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    ref = TorchDNeRF().eval()
    params = dnerf_params_from_torch(ref.state_dict(), depth=D)
    field = DNeRFField(depth=D, width=W, multires=MULTIRES,
                       multires_views=MULTIRES_VIEWS, skips=tuple(SKIPS))
    return ref, field, params


@pytest.mark.parametrize("t", [0.0, 0.37])
def test_raw_outputs_match(pair, t):
    ref, field, params = pair
    rng = np.random.default_rng(3)
    xyz = rng.normal(size=(32, 3)).astype(np.float32)
    dirs = rng.normal(size=(32, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    with torch.no_grad():
        raw_t = ref(torch.from_numpy(xyz), torch.from_numpy(dirs), t)
    raw_j = field.raw(params, jnp.asarray(xyz), jnp.asarray(dirs),
                      jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(raw_j), raw_t.numpy(), atol=3e-5)
