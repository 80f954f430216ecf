"""Persistent XLA compilation cache.

First compiles of the traced render/train graphs take minutes on TPU; the
persistent cache makes every later process start instantly on unchanged
graphs. Enabled by the CLIs (train/eval/mesh/bench).
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = None) -> None:
    import jax

    try:
        # TPU only: XLA:CPU AOT artifacts key on exact host CPU features and
        # can be served back on a host whose feature set differs (observed:
        # "+prefer-no-scatter ... not supported on the host machine" followed
        # by an UNIMPLEMENTED bf16-dot thunk at run time).
        if jax.default_backend() not in ("tpu", "axon"):
            return
    except Exception:
        return
    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                  os.path.expanduser("~/.cache/mnerf_xla"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass  # older jax or read-only fs: caching is best-effort
