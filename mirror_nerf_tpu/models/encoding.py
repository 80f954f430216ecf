"""Encoder factory (capability parity with reference `models/encoding.py`).

`get_encoder(name)` returns `(encoder, output_dim)` for the same encoding
names the reference factory dispatches on (`encoding.py:52-123`):
None / frequency / sphere_harmonics / hashgrid / tiledgrid. Frequency and SH
encoders are plain functions; grid encoders are `GridEncoder` wrappers that
hold the static `HashGridSpec` and expose `init(key)` for their tables.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..ops.hashgrid import HashGridSpec, hashgrid_encode, init_hashgrid
from ..ops.sh import sh_encode
from .embedding import posenc, posenc_dim


@dataclass(frozen=True)
class GridEncoder:
    spec: HashGridSpec

    @property
    def output_dim(self) -> int:
        return self.spec.output_dim

    def init(self, key: jax.Array, dtype=jnp.float32):
        return init_hashgrid(key, self.spec, dtype)

    def __call__(self, table, x, bound: float = 1.0):
        x01 = (x + bound) / (2.0 * bound)
        return hashgrid_encode(table, x01, self.spec)


def get_encoder(
    encoding: str,
    input_dim: int = 3,
    multires: int = 6,
    degree: int = 4,
    num_levels: int = 16,
    level_dim: int = 2,
    base_resolution: int = 16,
    log2_hashmap_size: int = 19,
    desired_resolution: int = 2048,
    align_corners: bool = False,
    **kwargs,
):
    if encoding == "None":
        return (lambda x, **kw: x), input_dim

    if encoding == "frequency":
        def freq(x, **kw):
            return posenc(x, multires)

        return freq, posenc_dim(input_dim, multires)

    if encoding == "sphere_harmonics":
        def sh(x, **kw):
            return sh_encode(x, degree)

        return sh, degree ** 2

    if encoding in ("hashgrid", "tiledgrid"):
        spec = HashGridSpec(
            input_dim=input_dim, num_levels=num_levels, level_dim=level_dim,
            base_resolution=base_resolution,
            log2_hashmap_size=log2_hashmap_size,
            desired_resolution=desired_resolution,
            gridtype="hash" if encoding == "hashgrid" else "tiled",
            align_corners=align_corners,
        )
        enc = GridEncoder(spec)
        return enc, enc.output_dim

    raise NotImplementedError(
        "Unknown encoding mode, choose from "
        "[None, frequency, sphere_harmonics, hashgrid, tiledgrid]")
