"""Field models: MLPs mapping (xyz, dir) -> (sigma, rgb, normal, mirror prob).

`MirrorNeRFField` has capability parity with the reference's default model
(`models/mirror_nerf.py:41-213`): an 8x256 trunk with a skip at layer 4,
a raw-σ head, a view-conditioned RGB head, a 2-linear normal head (no
activation in between) and a LeakyReLU+sigmoid mirror-probability head.

Unlike the torch version — which mixes embedding, autograd-normal computation
and detach plumbing into `forward` — the field here is a set of small pure
functions over a param pytree; the renderer composes them (including the
σ-gradient normal via one batched `jax.vjp`) so everything stays jittable.

The hash-grid variant (reference `models/mirror_nerf_tcnn.py`) lives in
`models/ngp.py` and exposes the same protocol.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from .embedding import posenc, posenc_dim
from .nn import init_linear, leaky_relu, relu, sigmoid


@dataclass(frozen=True)
class MirrorNeRFField:
    """Static architecture description (hashable; closed over by jit)."""

    N_emb_xyz: int = 10
    N_emb_dir: int = 4
    depth: int = 8
    width: int = 256
    skips: Tuple[int, ...] = (4,)
    predict_normal: bool = True
    predict_mirror_mask: bool = True
    # "bfloat16" runs the trunk/head matmuls in bf16 on the MXU (params stay
    # fp32; σ / rgb / normals are returned fp32). Used by the eval/bench path.
    compute_dtype: str = "float32"

    @property
    def in_xyz(self) -> int:
        return posenc_dim(3, self.N_emb_xyz)

    @property
    def in_dir(self) -> int:
        return posenc_dim(3, self.N_emb_dir)

    @property
    def supports_fused(self) -> bool:
        """Whether ops/pallas/fused_mlp.py can run this architecture
        (embeddings fit the padded 128-lane inputs; MXU-aligned width)."""
        return (self.in_xyz <= 128 and self.in_dir <= 128
                and self.width % 128 == 0)

    # ---- params ----

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        W, D = self.width, self.depth
        keys = iter(jax.random.split(key, D + 8))
        params = {}
        trunk = []
        for i in range(D):
            in_dim = self.in_xyz if i == 0 else (
                W + self.in_xyz if i in self.skips else W)
            trunk.append(init_linear(next(keys), in_dim, W, dtype=dtype))
        params["trunk"] = trunk
        params["sigma"] = init_linear(next(keys), W, 1, dtype=dtype)
        params["xyz_final"] = init_linear(next(keys), W, W, dtype=dtype)
        params["dir_enc"] = init_linear(next(keys), W + self.in_dir, W // 2,
                                        dtype=dtype)
        params["rgb"] = init_linear(next(keys), W // 2, 3, dtype=dtype)
        if self.predict_normal:
            params["normal"] = [
                init_linear(next(keys), W, W // 2, dtype=dtype),
                init_linear(next(keys), W // 2, 3, dtype=dtype),
            ]
        if self.predict_mirror_mask:
            params["is_mirror"] = [
                init_linear(next(keys), W, W // 2, dtype=dtype),
                init_linear(next(keys), W // 2, 1, dtype=dtype),
            ]
        return params

    # ---- forward pieces ----

    def _cast(self, x):
        if self.compute_dtype == "bfloat16":
            return x.astype(jnp.bfloat16)
        return x

    def _lin(self, p, x):
        y = x @ self._cast(p["w"])
        if "b" in p:
            y = y + self._cast(p["b"])
        return y

    def density(self, params: dict, xyz: jnp.ndarray):
        """(N, 3) raw world coords -> (sigma (N,), geo_feat (N, W)).

        σ is the raw head output: the renderer applies noise+ReLU, matching
        `rendering.py:189-192`. The positional embedding happens *inside* so
        jax.vjp w.r.t. `xyz` yields the analytic σ-gradient used for normals.
        """
        h0 = self._cast(posenc(xyz, self.N_emb_xyz))
        h = h0
        for i, layer in enumerate(params["trunk"]):
            if i in self.skips:
                h = jnp.concatenate([h0, h], axis=-1)
            h = relu(self._lin(layer, h))
        sigma = self._lin(params["sigma"], h)[..., 0]
        return sigma.astype(jnp.float32), h

    def color(self, params: dict, geo_feat: jnp.ndarray, dirs: jnp.ndarray):
        """(N, W) trunk features + (N, 3) unit view dirs -> (N, 3) rgb."""
        d = self._cast(posenc(dirs, self.N_emb_dir))
        h = self._lin(params["xyz_final"], self._cast(geo_feat))
        h = relu(self._lin(params["dir_enc"], jnp.concatenate([h, d], axis=-1)))
        return sigmoid(self._lin(params["rgb"], h).astype(jnp.float32))

    def normal_head(self, params: dict, geo_feat: jnp.ndarray):
        """Predicted (unnormalized) normal, (N, 3). Two linears, no act."""
        h = self._lin(params["normal"][0], self._cast(geo_feat))
        return self._lin(params["normal"][1], h).astype(jnp.float32)

    def mirror_head(self, params: dict, geo_feat: jnp.ndarray):
        """Per-point mirror probability, (N,)."""
        h = leaky_relu(self._lin(params["is_mirror"][0], self._cast(geo_feat)))
        return sigmoid(
            self._lin(params["is_mirror"][1], h).astype(jnp.float32))[..., 0]


def make_field(cfg) -> "MirrorNeRFField":
    """Build the field described by a Config (model_type dispatch)."""
    if cfg.model_type == "nerf":
        return MirrorNeRFField(
            N_emb_xyz=cfg.N_emb_xyz,
            N_emb_dir=cfg.N_emb_dir,
            predict_normal=cfg.predict_normal,
            predict_mirror_mask=cfg.predict_mirror_mask,
            compute_dtype=cfg.compute_dtype,
        )
    elif cfg.model_type == "nerf_tcnn":
        from .ngp import NGPField

        return NGPField(
            bound=cfg.bound,
            predict_normal=cfg.predict_normal,
            predict_mirror_mask=cfg.predict_mirror_mask,
            compute_dtype=cfg.compute_dtype,
            log2_hashmap_size=cfg.log2_hashmap_size,
        )
    elif cfg.model_type == "nerf_tpu":
        from .tpugrid import TPUGridField

        levels = tuple(
            (int(g), int(r))
            for g, r in (lv.split(":")
                         for lv in cfg.grid_levels.split(",") if lv))
        return TPUGridField(
            bound=cfg.bound,
            predict_normal=cfg.predict_normal,
            predict_mirror_mask=cfg.predict_mirror_mask,
            compute_dtype=cfg.compute_dtype,
            grid_levels=levels,
        )
    raise ValueError(f"unknown model_type {cfg.model_type!r}")
