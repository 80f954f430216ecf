"""NGP-style field: hash-grid encoder + small MLPs + SH direction encoding.

Capability parity with reference `models/mirror_nerf_tcnn.py` (MirrorNeRFTcnn):
  * 16-level ×2-feature HashGrid, log2_hashmap 19, base 16, per-level scale
    exp2(log2(2048·bound/16)/15) (:36-49)
  * 2×64 bias-free σ-net → (raw σ, 15-d geo_feat) (:52-66, 220-236) — σ has
    NO activation here; noise+ReLU happen in the renderer
  * SH(degree 4) direction encoding + 3×64 bias-free color net + sigmoid
    (:69-87, 238-247)
  * normal net: 2×64 bias-free MLP with interior ReLU (:119-138)
  * mirror net: Linear(15,32) + LeakyReLU + Linear(32,1) + sigmoid (:140-149)
  * world coords scaled (x+bound)/(2·bound) before encoding (:224)

Exposes the same Field protocol as `MirrorNeRFField`, so the renderer/tracer
are unchanged. bfloat16 table + activations are supported via
`compute_dtype` (the torch path trains this model with AMP fp16,
train.py:586).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.hashgrid import HashGridSpec, hashgrid_encode, init_hashgrid
from ..ops.sh import sh_encode
from .nn import linear, relu, leaky_relu, sigmoid


def _init_linear_nobias(key, in_dim, out_dim, dtype=jnp.float32):
    # torch nn.Linear(bias=False) default init: U(±1/sqrt(in))
    bound = 1.0 / (in_dim ** 0.5)
    return {"w": jax.random.uniform(key, (in_dim, out_dim), dtype, -bound,
                                    bound)}


@dataclass(frozen=True)
class NGPField:
    bound: float = 1.0
    num_layers: int = 2
    hidden_dim: int = 64
    geo_feat_dim: int = 15
    num_layers_color: int = 3
    hidden_dim_color: int = 64
    sh_degree: int = 4
    log2_hashmap_size: int = 19
    n_levels: int = 16
    predict_normal: bool = True
    predict_mirror_mask: bool = True
    compute_dtype: str = "float32"  # "bfloat16" for the fast path

    @property
    def grid_spec(self) -> HashGridSpec:
        n_levels = self.n_levels
        per_level_scale = float(
            np.exp2(np.log2(2048 * self.bound / n_levels) / (n_levels - 1)))
        return HashGridSpec(
            input_dim=3, num_levels=n_levels, level_dim=2,
            base_resolution=16, log2_hashmap_size=self.log2_hashmap_size,
            per_level_scale=per_level_scale,
        )

    @property
    def in_dim(self) -> int:
        return self.grid_spec.output_dim  # 32

    @property
    def in_dim_dir(self) -> int:
        return self.sh_degree ** 2  # 16

    def _init_grid(self, key: jax.Array, dtype) -> dict:
        return init_hashgrid(key, self.grid_spec, dtype)

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        keys = iter(jax.random.split(key, 16))
        p = {"grid": self._init_grid(next(keys), dtype)}
        dims = [self.in_dim] + [self.hidden_dim] * (self.num_layers - 1) + [
            1 + self.geo_feat_dim]
        p["sigma_net"] = [
            _init_linear_nobias(next(keys), dims[i], dims[i + 1], dtype)
            for i in range(self.num_layers)
        ]
        cdims = [self.in_dim_dir + self.geo_feat_dim] + [
            self.hidden_dim_color] * (self.num_layers_color - 1) + [3]
        p["color_net"] = [
            _init_linear_nobias(next(keys), cdims[i], cdims[i + 1], dtype)
            for i in range(self.num_layers_color)
        ]
        if self.predict_normal:
            ndims = [self.geo_feat_dim] + [self.hidden_dim] * (
                self.num_layers - 1) + [3]
            p["normal"] = [
                _init_linear_nobias(next(keys), ndims[i], ndims[i + 1], dtype)
                for i in range(self.num_layers)
            ]
        if self.predict_mirror_mask:
            from .nn import init_linear

            p["is_mirror"] = [
                init_linear(next(keys), self.geo_feat_dim,
                            self.hidden_dim // 2, dtype=dtype),
                init_linear(next(keys), self.hidden_dim // 2, 1, dtype=dtype),
            ]
        return p

    # ---- forward pieces (Field protocol) ----

    def _dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

    def density(self, params: dict, xyz: jnp.ndarray):
        """Raw world coords in [-bound, bound] → (σ raw, geo_feat)."""
        x01 = (xyz + self.bound) / (2.0 * self.bound)
        h = hashgrid_encode(params["grid"], x01, self.grid_spec)
        h = h.astype(self._dtype())
        for i, layer in enumerate(params["sigma_net"]):
            h = h @ layer["w"].astype(self._dtype())
            if i != self.num_layers - 1:
                h = relu(h)
        h = h.astype(jnp.float32)
        return h[..., 0], h[..., 1:]

    def color(self, params: dict, geo_feat: jnp.ndarray, dirs: jnp.ndarray):
        d = sh_encode(dirs, self.sh_degree)
        h = jnp.concatenate([d, geo_feat], axis=-1).astype(self._dtype())
        for i, layer in enumerate(params["color_net"]):
            h = h @ layer["w"].astype(self._dtype())
            if i != self.num_layers_color - 1:
                h = relu(h)
        return sigmoid(h.astype(jnp.float32))

    def normal_head(self, params: dict, geo_feat: jnp.ndarray):
        h = geo_feat
        for i, layer in enumerate(params["normal"]):
            h = h @ layer["w"]
            if i != self.num_layers - 1:
                h = relu(h)
        return h

    def mirror_head(self, params: dict, geo_feat: jnp.ndarray):
        h = leaky_relu(linear(params["is_mirror"][0], geo_feat))
        return sigmoid(linear(params["is_mirror"][1], h))[..., 0]
