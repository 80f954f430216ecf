"""mirror_nerf_tpu — a TPU-native (JAX/XLA/Pallas) Mirror-NeRF framework.

A from-scratch rebuild of the capabilities of zju3dv/Mirror-NeRF (ACM MM 2023):
a NeRF whose field predicts, per 3D point, density, view-dependent color, a
surface normal and a mirror probability, rendered with Whitted-style ray
tracing — mirror pixels spawn reflected secondary rays that are rendered
recursively (to a fixed unrolled depth inside a single jit) and alpha-blended
back by the learned mirror mask.

Design stance (TPU-first, not a torch translation):
  * pure functions + pytree params, no stateful modules
  * fixed shapes + masking instead of boolean compaction
  * the recursive ray trace is unrolled inside one jitted function
  * per-ray compositing via cumulative products the XLA way
  * multi-chip scaling by sharding the flat ray batch over a `data` mesh axis
"""

__version__ = "0.1.0"

# Raise libtpu's scoped-VMEM budget (default 16 MiB; v5e has 128 MiB
# physical VMEM). The fused-train backward kernel stashes per-level
# interpolated rows + hat/slope bases in VMEM scratch (~7.5 MB at 512
# lanes) to avoid recomputing them — worth ~31% of backward FLOPs
# (BASELINE.md). Must be set before libtpu initializes; importing this
# package precedes any device op in every CLI/tool. Respects an explicit
# user-provided value.
import os as _os

_VMEM_FLAG = "--xla_tpu_scoped_vmem_limit_kib"
if _VMEM_FLAG not in _os.environ.get("LIBTPU_INIT_ARGS", ""):
    _os.environ["LIBTPU_INIT_ARGS"] = (
        _os.environ.get("LIBTPU_INIT_ARGS", "")
        + f" {_VMEM_FLAG}=49152").strip()
del _os
