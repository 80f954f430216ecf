#!/usr/bin/env python
"""CP-kernel tuning sweep: lanes, sigma_only, level set.

Times fused_cp_forward on random sample blocks (points/s) to locate the
device-side budget: hat-basis construction (VPU) vs rank-64 matmuls (MXU).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pts", type=int, default=1 << 21)
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--lanes", type=int, nargs="+",
                   default=[512, 1024, 2048, 4096])
    p.add_argument("--level_sets", type=str, nargs="+",
                   default=["full", "no512", "64only"])
    p.add_argument("--sigma_only", type=int, nargs="+", default=[0, 1])
    args = p.parse_args()

    from mirror_nerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mirror_nerf_tpu.models.tpugrid import TPUGridField
    from mirror_nerf_tpu.ops.pallas.fused_cp import (CPFusedSpec,
                                                     fused_cp_forward,
                                                     pack_cp_params)

    field = TPUGridField(bound=6.0, predict_normal=True,
                         predict_mirror_mask=True, compute_dtype="bfloat16")
    params = field.init(jax.random.PRNGKey(0))
    t = args.pts

    level_sets = {
        "full": tuple(field.grid_levels),
        "no512": tuple(field.grid_levels[:-1]),
        "64only": (field.grid_levels[0],),
    }
    level_sets = {k: v for k, v in level_sets.items() if k in args.level_sets}

    for lanes in args.lanes:
        nb = t // lanes
        x3 = jax.random.uniform(jax.random.PRNGKey(1), (nb, 3, lanes),
                                jnp.float32)
        d3 = jax.random.normal(jax.random.PRNGKey(2), (nb, 3, lanes),
                               jnp.float32)
        for lname, levels in level_sets.items():
            for so in [bool(s) for s in args.sigma_only]:
                basis = os.environ.get("MNERF_CP_BASIS", "hat")
                spec = CPFusedSpec(levels=levels, sigma_only=so, lanes=lanes,
                                   basis=basis)
                packed = pack_cp_params(params, field, lanes=lanes,
                                        dtype=spec.jdtype, basis=basis)
                # drop packed entries for missing levels; slice fold to match
                packed = {k: v for k, v in packed.items()
                          if not (k[0] == "a" and "l" in k[:4]
                                  and int(k.split("l")[1]) >= len(levels))}
                sum_r = sum(r for _, r in levels)
                packed["fold"] = packed["fold"][:, :sum_r]
                try:
                    out = fused_cp_forward(packed, x3, d3, spec)
                    np.asarray(out[0, 0, 0])
                except Exception as e:  # noqa: BLE001
                    print(f"lanes={lanes} {lname} so={so}: FAIL "
                          f"{str(e)[:120]}")
                    continue
                best = 0.0
                for _ in range(2):
                    t0 = time.perf_counter()
                    outs = [fused_cp_forward(packed, x3, d3, spec)
                            for _ in range(args.iters)]
                    for o in outs:
                        np.asarray(o[0, 0, 0])
                    dt = time.perf_counter() - t0
                    best = max(best, args.iters * nb * lanes / dt)
                print(f"lanes={lanes} levels={lname} sigma_only={so}: "
                      f"{best/1e6:.1f} M pts/s")


if __name__ == "__main__":
    main()
