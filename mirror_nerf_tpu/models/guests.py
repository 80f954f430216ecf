"""Guest object fields for the reflect-newly-placed-objects application.

Capability parity with the reference's vendored guests:
  * D-NeRF `DirectTemporalNeRF` (models/d_nerf/run_dnerf_helpers.py:70-155):
    a canonical NeRF conditioned through a time-deformation net Δx(x, t)
    (zero at t=0), rendered by the D-NeRF pipeline (run_dnerf.py:381-597);
  * vanilla nerf_pl NeRF (models/nerf_pl/nerf_nerfpl.py:42-110) — same
    architecture as MirrorNeRF minus the normal/mirror heads, so we reuse
    `MirrorNeRFField` with those heads disabled.

Both load the reference's published torch checkpoints (.tar dict ckpts with
`network_fn_state_dict` / `network_fine_state_dict` for D-NeRF, re-parsing
`config.txt` from the ckpt dir exactly like eval.py:1068-1077).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.sampling import sample_pdf
from .embedding import posenc, posenc_dim
from .nn import init_linear, linear, relu


@dataclass(frozen=True)
class DNeRFField:
    """DirectTemporalNeRF restated in our functional style."""

    depth: int = 8
    width: int = 256
    multires: int = 10
    multires_views: int = 4
    skips: Tuple[int, ...] = (4,)
    use_viewdirs: bool = True
    zero_canonical: bool = True

    @property
    def in_pts(self) -> int:
        return posenc_dim(3, self.multires)

    @property
    def in_views(self) -> int:
        return posenc_dim(3, self.multires_views)

    @property
    def in_time(self) -> int:
        return posenc_dim(1, self.multires)

    def init(self, key: jax.Array) -> dict:
        D, W = self.depth, self.width
        keys = iter(jax.random.split(key, 4 * D + 10))
        p = {}
        # canonical NeRF trunk: skip concat AFTER layer i (i in skips)
        pts = [init_linear(next(keys), self.in_pts, W)]
        for i in range(D - 1):
            in_dim = W + (self.in_pts if i in self.skips else 0)
            pts.append(init_linear(next(keys), in_dim, W))
        p["pts"] = pts
        p["views"] = [init_linear(next(keys), self.in_views + W, W // 2)]
        p["feature"] = init_linear(next(keys), W, W)
        p["alpha"] = init_linear(next(keys), W, 1)
        p["rgb"] = init_linear(next(keys), W // 2, 3)
        # time-deformation net
        tnet = [init_linear(next(keys), self.in_pts + self.in_time, W)]
        for i in range(D - 1):
            in_dim = W + (self.in_pts if i in self.skips else 0)
            tnet.append(init_linear(next(keys), in_dim, W))
        p["time"] = tnet
        p["time_out"] = init_linear(next(keys), W, 3)
        return p

    def _trunk(self, layers, h0, params_list):
        h = h0
        for i, layer in enumerate(params_list):
            h = relu(linear(layer, h))
            if i in self.skips:
                h = jnp.concatenate([h0, h], axis=-1)
        return h

    def query_time(self, params, pts_emb, t_emb):
        """Δx(x, t). The skip re-concats the embedded *pts* only
        (run_dnerf_helpers.py:127-135)."""
        h = jnp.concatenate([pts_emb, t_emb], axis=-1)
        for i, layer in enumerate(params["time"]):
            h = relu(linear(layer, h))
            if i in self.skips:
                h = jnp.concatenate([pts_emb, h], axis=-1)
        return linear(params["time_out"], h)

    def raw(self, params, xyz, dirs, t: jnp.ndarray):
        """(N,3) pts + (N,3) dirs + scalar t → (N,4) raw [rgb, σ]."""
        pts_emb = posenc(xyz, self.multires)
        t_col = jnp.full_like(xyz[:, :1], t)
        t_emb = posenc(t_col, self.multires)
        dx = self.query_time(params, pts_emb, t_emb)
        if self.zero_canonical:
            dx = jnp.where(t == 0.0, 0.0, dx)
        h0 = posenc(xyz + dx, self.multires)
        h = h0
        for i, layer in enumerate(params["pts"]):
            h = relu(linear(layer, h))
            if i in self.skips:
                h = jnp.concatenate([h0, h], axis=-1)
        alpha = linear(params["alpha"], h)
        feat = linear(params["feature"], h)
        v = posenc(dirs, self.multires_views)
        hv = relu(linear(params["views"][0],
                         jnp.concatenate([feat, v], axis=-1)))
        rgb = linear(params["rgb"], hv)
        return jnp.concatenate([rgb, alpha], axis=-1)


def dnerf_raw2outputs(raw, z_vals, rays_d, white_bkgd: bool = False):
    """D-NeRF compositing (run_dnerf.py:381-438)."""
    dists = z_vals[:, 1:] - z_vals[:, :-1]
    dists = jnp.concatenate([dists, jnp.full_like(dists[:, :1], 1e10)], -1)
    dists = dists * jnp.linalg.norm(rays_d[:, None, :], axis=-1)
    rgb = jax.nn.sigmoid(raw[..., :3])
    alpha = 1.0 - jnp.exp(-jax.nn.relu(raw[..., 3]) * dists)
    shifted = jnp.concatenate(
        [jnp.ones_like(alpha[:, :1]), 1.0 - alpha + 1e-10], -1)
    weights = alpha * jnp.cumprod(shifted[:, :-1], axis=-1)
    rgb_map = jnp.sum(weights[..., None] * rgb, axis=1)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[:, None])
    return rgb_map, depth_map, acc_map, weights


def dnerf_render(field: DNeRFField, params: dict, rays: jnp.ndarray,
                 t: jnp.ndarray, rng: jax.Array, N_samples: int = 64,
                 N_importance: int = 0, white_bkgd: bool = False,
                 params_fine: Optional[dict] = None) -> dict:
    """Render (N,8) rays through the D-NeRF pipeline at time t ∈ [0,1]."""
    o, d = rays[:, 0:3], rays[:, 3:6]
    near, far = rays[:, 6:7], rays[:, 7:8]
    viewdirs = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    z_steps = jnp.linspace(0.0, 1.0, N_samples)
    z_vals = jnp.broadcast_to(near * (1 - z_steps) + far * z_steps,
                              (rays.shape[0], N_samples))

    def run(p, z):
        xyz = o[:, None, :] + d[:, None, :] * z[..., None]
        n, s = z.shape
        raw = field.raw(p, xyz.reshape(-1, 3),
                        jnp.repeat(viewdirs, s, axis=0), t)
        return dnerf_raw2outputs(raw.reshape(n, s, 4), z, d, white_bkgd)

    rgb, depth, acc, weights = run(params, z_vals)
    if N_importance > 0:
        z_mid = 0.5 * (z_vals[:, 1:] + z_vals[:, :-1])
        z_samp = sample_pdf(rng, z_mid,
                            jax.lax.stop_gradient(weights[:, 1:-1]),
                            N_importance, det=True)
        z_all = jnp.sort(jnp.concatenate([z_vals, z_samp], -1), -1)
        rgb, depth, acc, weights = run(params_fine or params, z_all)
    return {"rgb": rgb, "depth": depth, "opacity": acc}


# ---- torch checkpoint interop ----


def _tl(sd, prefix):
    out = {"w": np.asarray(sd[f"{prefix}.weight"], np.float32).T}
    if f"{prefix}.bias" in sd:
        out["b"] = np.asarray(sd[f"{prefix}.bias"], np.float32)
    return out


def dnerf_params_from_torch(sd: dict, depth: int = 8) -> dict:
    sd = {k: (v.numpy() if hasattr(v, "numpy") else v) for k, v in sd.items()}
    return {
        "pts": [_tl(sd, f"_occ.pts_linears.{i}") for i in range(depth)],
        "views": [_tl(sd, "_occ.views_linears.0")],
        "feature": _tl(sd, "_occ.feature_linear"),
        "alpha": _tl(sd, "_occ.alpha_linear"),
        "rgb": _tl(sd, "_occ.rgb_linear"),
        "time": [_tl(sd, f"_time.{i}") for i in range(depth)],
        "time_out": _tl(sd, "_time_out"),
    }


def parse_dnerf_config(path: str) -> dict:
    """Minimal configargparse `config.txt` reader (key = value lines)."""
    out = {}
    if not os.path.exists(path):
        return out
    with open(path) as f:
        for line in f:
            line = line.split("#")[0].strip()
            if "=" not in line:
                continue
            k, v = [s.strip() for s in line.split("=", 1)]
            if v in ("True", "true"):
                out[k] = True
            elif v in ("False", "false"):
                out[k] = False
            else:
                try:
                    out[k] = int(v)
                except ValueError:
                    try:
                        out[k] = float(v)
                    except ValueError:
                        out[k] = v
    return out


def make_object_render_fn(cfg, model_type: str, ckpt_path: str,
                          transform=((0.0, 0.0, 0.0), 1.0)):
    """Build the jittable object-render callable for the eval app.

    Returns fn(rays (N,8), frame_time) -> {"rgb","depth","opacity"}, with a
    `.transform` attribute carrying the scene-specific (translation, scale).
    """
    if model_type == "d_nerf":
        dconf = parse_dnerf_config(
            os.path.join(os.path.dirname(ckpt_path), "config.txt"))
        field = DNeRFField(
            depth=dconf.get("netdepth", 8), width=dconf.get("netwidth", 256),
            multires=dconf.get("multires", 10),
            multires_views=dconf.get("multires_views", 4),
            use_viewdirs=dconf.get("use_viewdirs", True),
        )
        import torch

        ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
        params = dnerf_params_from_torch(ckpt["network_fn_state_dict"],
                                         field.depth)
        params_fine = None
        if "network_fine_state_dict" in ckpt and ckpt[
                "network_fine_state_dict"]:
            params_fine = dnerf_params_from_torch(
                ckpt["network_fine_state_dict"], field.depth)
        n_samples = dconf.get("N_samples", 64)
        n_importance = dconf.get("N_importance", 0)

        def fn(rays, frame_time):
            # the app overrides near=2, far=6 (reference eval.py:1077)
            rays = rays.at[:, 6].set(2.0).at[:, 7].set(6.0)
            return dnerf_render(field, params, rays,
                                jnp.asarray(frame_time),
                                jax.random.PRNGKey(0), n_samples,
                                n_importance, white_bkgd=True,
                                params_fine=params_fine)
    elif model_type == "nerf_pl":
        from ..render.renderer import RenderSettings, render_rays
        from .fields import MirrorNeRFField
        from ..train.checkpoints import load_torch_ckpt

        field = MirrorNeRFField(predict_normal=False,
                                predict_mirror_mask=False)
        params = load_torch_ckpt(ckpt_path, want_fine=True)
        rs = RenderSettings(N_samples=64, N_importance=64, perturb=0.0,
                            noise_std=0.0, test_time=False,
                            compute_normal=False, white_back=True,
                            fine_pass="fine" if "fine" in params else "none")

        def fn(rays, frame_time):
            res = render_rays(field, params, rays, jax.random.PRNGKey(0), rs)
            typ = "fine" if "rgb_fine" in res else "coarse"
            return {"rgb": res[f"rgb_{typ}"], "depth": res[f"depth_{typ}"],
                    "opacity": res[f"opacity_{typ}"]}
    else:
        raise ValueError(f"unknown obj_model_type {model_type!r}")

    fn.transform = transform
    return fn
