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
