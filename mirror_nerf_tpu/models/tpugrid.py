"""TPU-native fast field: CP-factorized grid encoder + the NGP heads.

This is this framework's answer to the reference's `MirrorNeRFTcnn` speed
model (`models/mirror_nerf_tcnn.py`, run.sh:5 "For speedup"). The reference
gets its speed from a CUDA hash grid; measured on TPU, hash-table random
access is index-rate-bound (~10²M rows/s vs the ~10⁴M needed — see
ops/cpgrid.py), so the TPU-first design replaces the hash table with a
CP-factorized multiscale grid whose lookup is linear interpolation of 1-D
tables — MXU matmuls in the fused kernel, no gathers.

Everything downstream of the encoder is identical to `NGPField` (σ-net
2×64 → raw σ + 15-d geo feature, SH(4) color net, normal / mirror heads),
so the renderer, tracer, losses, trainer, and checkpoints treat the two
interchangeably; `--model_type nerf_tpu` selects it.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.cpgrid import CPGridSpec, cpgrid_encode, init_cpgrid
from .ngp import NGPField


@dataclass(frozen=True)
class TPUGridField(NGPField):
    # (resolution, rank) per scale; the finest scale bounds detail like the
    # hash grid's top level, coarse scales give smooth low-frequency support
    grid_levels: Tuple[Tuple[int, int], ...] = ((64, 64), (256, 64),
                                                (512, 64))

    @property
    def cp_spec(self) -> CPGridSpec:
        return CPGridSpec(levels=self.grid_levels, n_features=32)

    @property
    def supports_fused_cp(self) -> bool:
        """Eval-path fused kernel (ops/pallas/fused_cp.py) available when
        both heads are present and the net dims match the kernel's packed
        row layout (σ row + 15 geo rows, 64-wide nets, SH4) — non-default
        dims fall back to the unfused XLA path instead of mis-slicing."""
        return (self.predict_normal and self.predict_mirror_mask
                and self.geo_feat_dim == 15 and self.hidden_dim == 64
                and self.num_layers == 2 and self.num_layers_color == 3
                and self.hidden_dim_color == 64 and self.sh_degree == 4)

    @property
    def supports_fused_train(self) -> bool:
        """Training-side fused density+∇σ custom-VJP kernel
        (ops/pallas/fused_cp_train.py): needs the standard 2-layer σ-net
        (any grid_levels / bound work — the kernel is generic in G, R)."""
        return self.num_layers == 2 and self.geo_feat_dim == 15

    @property
    def in_dim(self) -> int:
        return self.cp_spec.output_dim  # 32, same as the hash grid

    def _init_grid(self, key: jax.Array, dtype) -> dict:
        return init_cpgrid(key, self.cp_spec, dtype)

    def density(self, params: dict, xyz: jnp.ndarray):
        """Raw world coords in [-bound, bound] → (σ raw, geo_feat)."""
        from .nn import relu

        x01 = (xyz + self.bound) / (2.0 * self.bound)
        h = cpgrid_encode(params["grid"], x01, self.cp_spec,
                          compute_dtype=self._dtype())
        for i, layer in enumerate(params["sigma_net"]):
            h = h @ layer["w"].astype(self._dtype())
            if i != self.num_layers - 1:
                h = relu(h)
        h = h.astype(jnp.float32)
        return h[..., 0], h[..., 1:]
