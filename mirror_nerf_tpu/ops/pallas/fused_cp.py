"""Fused TPU kernel for the CP-grid speed field (TPUGridField).

One pallas_call evaluates, for a block of samples, the entire field:
CP-grid encode -> σ-net -> (SH dir encode -> color net), normal net, mirror
net, plus the nonlinear epilogue — with every table/weight VMEM-resident and
no gather anywhere.

Layout: everything runs TRANSPOSED ("feature-major"): samples live on the
lane axis (blocks of L=1024 lanes), features/channels on sublanes. This is
what makes the design work on TPU:

  * the 1-D table lookup becomes a matmul. For a table A ∈ (R, G) and the
    hat-function basis  B[j, t] = max(0, 1 − |x_t·(G−1) − j|)  (G, L) built
    from a broadcasted iota, `A @ B` IS linear interpolation — MXU work,
    no random access (see ops/cpgrid.py for why gathers are disqualified);
  * per-sample scalars (coords, σ) are (1, L) rows, so nothing ever needs a
    narrow lane slice of a wide row — the wide axis is always channels;
  * the normal's L2-normalization is 3-row arithmetic.

The XLA adapter reshapes sample-major inputs to axis-major rows and
composites directly from the (8, L) output rows (σ, rgb, normal, mirror) —
the per-sample output is 8 floats, 16× less HBM traffic than a lane-padded
row per sample.

Forward-only (eval path); training uses the differentiable XLA encoder.
Reference capability: this is the fast-model eval path, the counterpart of
tcnn's fused eval in `models/mirror_nerf_tcnn.py`.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# samples per grid step. Measured end-to-end on the bench: 1024 -> 2048
# +14%, 2048 -> 4096 +6% (1.195-1.200M rays/s; 8192 is flat with 4096 at
# double the VMEM peak) — fewer grid steps amortize the per-block composite
# machinery. See BASELINE.md rays-mode stage budget.
LANES = 4096

# Grid iterations are independent blocks: declaring the (single) grid
# dimension "parallel" lets Mosaic overlap each block's HBM<->VMEM DMAs
# with the previous block's compute (double-buffering) instead of
# serializing them — this is the per-grid-step fixed cost the io-floor
# ablation measures (BASELINE.md, ~4.5 us/step at lanes=4096).
_PARALLEL = pltpu.CompilerParams(dimension_semantics=("parallel",))



@dataclass(frozen=True)
class CPFusedSpec:
    levels: Tuple[Tuple[int, int], ...]  # (resolution, rank) per scale
    n_features: int = 32
    geo_feat_dim: int = 15
    hidden_dim: int = 64
    hidden_dim_color: int = 64
    sh_degree: int = 4
    sigma_only: bool = False
    predict_normal: bool = True
    predict_mirror_mask: bool = True
    lanes: int = LANES
    # >0 enables IN-KERNEL compositing (samples per ray; lanes % samples
    # == 0): the kernel consumes z/δ rows and emits per-ray composited
    # rows + per-sample weights, like ops/pallas/fused_mlp_t.py
    samples: int = 0
    # interpolation basis construction:
    #   "hat": B[j] = relu(1 - |xf - j|), tables packed raw (5 VPU passes)
    #   "cum": B[j] = clamp(xf - j + 1, 0, 1), tables packed as first-order
    #          differences A_cum[:, j] = A[:, j] - A[:, j-1] (A_cum[:, 0] =
    #          A[:, 0]) — algebraically the same interpolant (the clamp
    #          basis telescopes: Σ_j ΔA_j·c_{j-1} = lerp(A, xf)), but the
    #          per-element basis build is 3 VPU passes, and values stay in
    #          [0, 1] (bf16-safe)
    basis: str = "hat"
    # σ -> density nonlinearity in the in-kernel compositing ("relu" |
    # "softplus"); see renderer.sigma_activation
    sigma_act: str = "relu"
    # "bfloat16" on TPU; "float32" in interpret mode (XLA:CPU cannot execute
    # large bf16 DotThunks: "Unsupported element type ... BF16 x BF16 = F32")
    dtype: str = "bfloat16"
    # Measurement-only stage ablations (tools/exp_cp_ablate.py) — wrong
    # numerics, same shapes/op structure. Every variant stays data-dependent
    # on the inputs so nothing constant-folds:
    #   "const_basis": 1-pass basis build (isolates the basis VPU cost)
    #   "const_feats": skip basis+tables+product (isolates the encoder)
    #   "enc_only":    encoder only, σ = feats row 0 (with sigma_only)
    #   "io":          σ = x row 0 — the pallas_call I/O + overhead floor
    #   "io_noexpand": io, minus the ray→sample one-hot expand (rays mode)
    #   "io_noscan":   io, minus the prefix roll-scan (rays mode)
    #   "io_min":      rays mode: pure block I/O + grid overhead (wts = z
    #                  scaled by an od element; no expand/roll/scan at all)
    #   "io_nowts":    io_min with NO weight/const inputs at all — isolates
    #                  whether constant-index blocks are re-DMA'd per step
    ablate: str = ""
    # Composite mode with per-RAY inputs: consume (9, R) rows (pre-scaled
    # origin, pre-scaled dir, view dir) + the (1, L) z row, and build the
    # per-sample x3/d3/δ in VMEM (segment-expand matmul + roll difference).
    # Cuts the kernel's per-sample input traffic from 32 B to ~4 B and
    # removes the adapter's out-of-kernel x3/d3 builds (the io floor was
    # 26% of kernel time — BASELINE.md stage budget).
    ray_inputs: bool = False

    @property
    def jdtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32

    @property
    def rays_per_block(self) -> int:
        assert self.samples > 0 and self.lanes % self.samples == 0
        return self.lanes // self.samples


def pack_cp_params(params: dict, field, lanes: int = LANES,
                   dtype=jnp.bfloat16, basis: str = "hat",
                   n_levels: int = None) -> dict:
    """Transpose/pad a TPUGridField param pytree for the fused kernel.

    `lanes` is kept for call-site stability but no longer shapes anything:
    biases are packed as (rows, 1) columns and broadcast in-kernel.

    All matrices are stored (out, in) so the kernel computes W @ x with
    x channels on sublanes. Head outputs are pre-placed into the packed
    8-row output space (0 σ, 1:4 rgb, 4:7 normal, 7 mirror) so the kernel
    just sums matmul results. With basis="cum" the axis tables are packed
    as first-order differences (see CPFusedSpec.basis).

    `n_levels` (proposal-lite): pack only the first n coarsest CP levels and
    the matching fold columns — the exact truncated interpolant used by the
    σ-only proposal pass (RenderSettings.proposal_drop). Identical to
    evaluating a field whose grid_levels / fold were sliced the same way.
    """
    spec = field.cp_spec
    levels = spec.levels if n_levels is None else spec.levels[:n_levels]
    p = {}
    for a in range(3):
        for li, (g, r) in enumerate(levels):
            t = jnp.asarray(params["grid"]["axes"][a][li], jnp.float32).T
            if basis == "cum":
                t = jnp.concatenate([t[:, :1], t[:, 1:] - t[:, :-1]], axis=1)
            p[f"a{a}l{li}"] = t.astype(dtype)
    keep_r = sum(r for _, r in levels)
    p["fold"] = params["grid"]["fold"].T[:, :keep_r].astype(dtype)  # (32, ΣR)
    s = params["sigma_net"]
    p["s1"] = s[0]["w"].T.astype(dtype)  # (64, 32)
    p["s2"] = s[1]["w"].T.astype(dtype)  # (16, 64)
    if not field.predict_normal or not field.predict_mirror_mask:
        raise NotImplementedError("fused CP kernel packs all heads")
    # The three head stacks are PACKED into two matmuls around the shared
    # color hidden layer: every first-layer head consumes a slice of
    # cin = [sh(16); geo(15); 0] (c1 all 32 rows; n1/m1 the geo rows), so
    # one (160, 32) matmul evaluates all three; every last layer writes
    # disjoint rows of the packed 8-row output, so one (8, 160) matmul on
    # the stacked hidden activations [hc2(64); hn(64); hm(32)] finishes
    # them. 3 MXU ops instead of 7 skinny ones (M ∈ {64, 32, 8} with
    # K ∈ {15, 32}; the MXU is latency- not FLOP-bound there).
    c = params["color_net"]
    w0 = jnp.asarray(c[0]["w"], jnp.float32)  # (16+15, 64)
    c1 = jnp.pad(w0, ((0, 1), (0, 0))).T  # (64, 32)
    p["c2"] = c[1]["w"].T.astype(dtype)  # (64, 64)
    c3 = jnp.asarray(c[2]["w"], jnp.float32).T  # (3, 64)
    c3 = jnp.pad(c3, ((1, 4), (0, 0)))  # (8, 64): rgb raw in rows 1:4
    n = params["normal"]
    n1 = jnp.pad(jnp.asarray(n[0]["w"], jnp.float32).T,
                 ((0, 0), (16, 1)))  # (64, 32): reads the geo rows of cin
    n2 = jnp.asarray(n[1]["w"], jnp.float32).T  # (3, 64)
    n2 = jnp.pad(n2, ((4, 1), (0, 0)))  # (8, 64): normal raw in rows 4:7
    m = params["is_mirror"]
    m1 = jnp.pad(jnp.asarray(m[0]["w"], jnp.float32).T,
                 ((0, 0), (16, 1)))  # (32, 32)
    # biases as (rows, 1) columns, broadcast in-kernel (fused_mlp_t
    # convention) — lane-wide constant blocks cost VMEM per block
    p["m1b"] = jnp.asarray(m[0]["b"], jnp.float32)[:, None]
    m2 = jnp.asarray(m[1]["w"], jnp.float32).T  # (1, 32)
    m2 = jnp.pad(m2, ((7, 0), (0, 0)))  # (8, 32): mirror in row 7
    p["h1"] = jnp.concatenate([c1, n1, m1], axis=0).astype(dtype)  # (160, 32)
    p["hf"] = jnp.concatenate([c3, n2, m2], axis=1).astype(dtype)  # (8, 160)
    ob = jnp.zeros((8, 1), jnp.float32)
    p["obias"] = ob.at[7, 0].set(jnp.asarray(m[1]["b"], jnp.float32)[0])
    return p


def _mm(w, x):
    # NOTE: on the TPU MXU, DEFAULT precision truncates fp32 operands to
    # bf16 (requesting Precision.HIGHEST fails to lower in Mosaic on this
    # toolchain). Matmuls whose fp32 operand carries POSITIONS must use
    # _mm_hilo instead — see fused_mlp_t._mm_hilo.
    return jax.lax.dot_general(
        w, x, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _hat_basis(x01_row, g: int, dtype=jnp.bfloat16):
    """(1, L) coords in [0,1] -> (G, L) linear-interp (hat) basis."""
    xf = jnp.clip(x01_row, 0.0, 1.0) * (g - 1)
    j = jax.lax.broadcasted_iota(
        jnp.int32, (g, x01_row.shape[-1]), 0).astype(jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(xf - j)).astype(dtype)


def _cum_basis(x01_row, g: int, dtype=jnp.bfloat16):
    """(1, L) coords in [0,1] -> (G, L) clamped-ramp basis: row j =
    clamp(xf - j + 1, 0, 1). Row 0 is constant 1 (xf >= 0). Against
    difference-packed tables this computes the identical linear
    interpolant in 3 elementwise passes instead of 5."""
    xf = jnp.clip(x01_row, 0.0, 1.0) * (g - 1)
    j = jax.lax.broadcasted_iota(
        jnp.int32, (g, x01_row.shape[-1]), 0).astype(jnp.float32)
    return jnp.clip(xf - j + 1.0, 0.0, 1.0).astype(dtype)


def _sh4_rows(d):
    """Real SH degrees 1..4 of (3, L) dirs -> (16, L).

    Same constants as ops/sh.py (reference shencoder.cu); transposed layout.
    The closed forms assume unit directions, so normalize here (3 row ops)
    rather than trusting every caller.
    """
    x, y, z = d[0:1], d[1:2], d[2:3]
    inv = jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z, 1e-12))
    x, y, z = x * inv, y * inv, z * inv
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    rows = [
        jnp.full_like(x, 0.28209479177387814),
        -0.48860251190291987 * y,
        0.48860251190291987 * z,
        -0.48860251190291987 * x,
        1.0925484305920792 * xy,
        -1.0925484305920792 * yz,
        0.94617469575755997 * zz - 0.31539156525251999,
        -1.0925484305920792 * xz,
        0.54627421529603959 * (xx - yy),
        0.59004358992664352 * y * (-3.0 * xx + yy),
        2.8906114426405538 * xy * z,
        0.45704579946446572 * y * (1.0 - 5.0 * zz),
        0.3731763325901154 * z * (5.0 * zz - 3.0),
        0.45704579946446572 * x * (1.0 - 5.0 * zz),
        1.4453057213202769 * z * (xx - yy),
        0.59004358992664352 * x * (-xx + 3.0 * yy),
    ]
    return jnp.concatenate(rows, axis=0)


def _field_rows(spec: CPFusedSpec, w, x3, d3):
    """Shared field evaluation: (3, L) coords/dirs -> (σ (1,L) fp32,
    final rows (8, L) or None when sigma_only)."""
    bf = spec.jdtype
    lanes = x3.shape[-1]
    if spec.ablate == "io":
        return x3[0:1, :].astype(jnp.float32), None
    basis_fn = _cum_basis if spec.basis == "cum" else _hat_basis
    if spec.ablate == "const_feats":
        sr = sum(r for _, r in spec.levels)
        ramp = jax.lax.broadcasted_iota(
            jnp.int32, (sr, lanes), 0).astype(jnp.float32)
        feats = (ramp * 0.001 + x3[0:1, :]).astype(bf)
    else:
        per_level = []
        for li, (g, r) in enumerate(spec.levels):
            prod = None
            for a in range(3):
                if spec.ablate == "const_basis":
                    ramp = jax.lax.broadcasted_iota(
                        jnp.int32, (g, lanes), 0).astype(jnp.float32)
                    basis = (ramp * 0.001 + x3[a:a + 1, :]).astype(bf)
                else:
                    basis = basis_fn(x3[a:a + 1, :], g, bf)
                f = _mm(w[f"a{a}l{li}"][...], basis)  # (R, L) fp32
                prod = f if prod is None else prod * f
            per_level.append(prod.astype(bf))
        feats = jnp.concatenate(per_level, axis=0)  # (ΣR, L)
    if spec.ablate == "enc_only":
        # sum over ALL feature rows so Mosaic cannot dead-code the tables
        return jnp.sum(feats.astype(jnp.float32), 0, keepdims=True), None

    h = _mm(w["fold"][...], feats).astype(bf)  # (32, L)
    h = jnp.maximum(_mm(w["s1"][...], h), 0.0).astype(bf)
    sg = _mm(w["s2"][...], h)  # (16, L) fp32: row 0 σ, rows 1:16 geo
    sigma = sg[0:1, :]

    if spec.sigma_only:
        return sigma, None

    geo = sg[1:16, :].astype(bf)  # (15, L)
    sh = _sh4_rows(d3).astype(bf)  # (16, L)
    cin = jnp.concatenate(
        [sh, geo, jnp.zeros((1, sh.shape[-1]), bf)], axis=0)  # (32, L)
    # all three head stacks in 3 packed matmuls (see pack_cp_params):
    # pre rows 0:64 = c1 @ cin, 64:128 = n1 @ geo, 128:160 = m1 @ geo
    pre = _mm(w["h1"][...], cin)  # (160, L) fp32
    hc = jnp.maximum(pre[0:64, :], 0.0).astype(bf)
    hn = jnp.maximum(pre[64:128, :], 0.0).astype(bf)
    hm = pre[128:160, :] + w["m1b"][...]
    hm = jnp.where(hm >= 0, hm, 0.01 * hm).astype(bf)
    hc2 = jnp.maximum(_mm(w["c2"][...], hc), 0.0).astype(bf)
    stacked = jnp.concatenate([hc2, hn, hm], axis=0)  # (160, L)
    out = _mm(w["hf"][...], stacked) + w["obias"][...]

    # epilogue: σ raw; rgb/mirror sigmoid; normal L2-normalized (row math)
    rgb = jax.nn.sigmoid(out[1:4, :])
    n = out[4:7, :]
    nsq = jnp.sum(n * n, axis=0, keepdims=True)
    n = n * jax.lax.rsqrt(jnp.maximum(nsq, 1.1920929e-07))
    mir = jax.nn.sigmoid(out[7:8, :])
    return sigma, jnp.concatenate([sigma, rgb, n, mir], axis=0)


def _kernel(spec: CPFusedSpec, names, x_ref, d_ref, *w_refs):
    out_ref = w_refs[-1]
    w = {n: r for n, r in zip(names, w_refs[:-1])}
    x3 = x_ref[0]  # (3, L) fp32 coords in [0,1]
    sigma, rows = _field_rows(spec, w, x3, d_ref[0])
    if rows is None:
        out_ref[0] = jnp.concatenate(
            [sigma, jnp.zeros((7, x3.shape[-1]), jnp.float32)], axis=0)
    else:
        out_ref[0] = rows


def _act_density(sigma, act: str):
    """In-kernel σ -> density nonlinearity (fp32 VPU ops only; `log1p`/`exp`
    lower in Mosaic). Stable softplus: max(x,0) + log(1 + exp(-|x|))."""
    if act == "softplus":
        return (jnp.maximum(sigma, 0.0)
                + jnp.log(1.0 + jnp.exp(-jnp.abs(sigma))))
    return jnp.maximum(sigma, 0.0)


def _kernel_composite(spec: CPFusedSpec, names, x_ref, d_ref, z_ref, dl_ref,
                      *refs):
    """Composite mode: per-ray output + per-sample weights (see
    fused_mlp_t._kernel for the TRI/SUM construction)."""
    w = {n: r for n, r in zip(names, refs[:len(names)])}
    if spec.sigma_only:
        wts_ref = refs[-1]
    else:
        summ = refs[len(names)]
        out_ref, wts_ref = refs[-2], refs[-1]
    x3 = x_ref[0]
    sigma, rows = _field_rows(spec, w, x3, d_ref[0])

    # per-ray exclusive prefix via the segmented roll scan (the TRI matmul
    # it replaced ran at 1/128 MXU row utilization — fused_mlp_t._prefix_weights)
    from .fused_mlp_t import _prefix_weights

    sd = dl_ref[0] * _act_density(sigma, spec.sigma_act)  # (1, L)
    wts = _prefix_weights(sd, spec.samples)
    wts_ref[0] = wts
    if spec.sigma_only:
        return
    vals = jnp.concatenate(
        [jnp.ones_like(sigma), rows[1:8, :], z_ref[0]], axis=0)  # (9, L)
    pmap = _mm((vals * wts).astype(jnp.float32), summ[...])  # (9, R)
    out_ref[0] = jnp.pad(pmap, ((0, 16 - pmap.shape[0]), (0, 0)))


def _kernel_composite_rays(spec: CPFusedSpec, names, od_ref, z_ref, *refs):
    """Composite mode with per-RAY inputs: od (9, R) rows are
    [o' = (o+bound)/2bound, d' = d/2bound, view dir]; x3/d3/δ are built in
    VMEM. The segment-expand (ray r -> its S lanes) is an exact one-hot
    fp32 matmul (BCAST = SUM^T), and δ is a within-ray forward difference
    of z via one lane rotation."""
    from .fused_mlp_t import _prefix_weights

    w = {n: r for n, r in zip(names, refs[:len(names)])}
    if spec.sigma_only:
        bcast = refs[len(names)]
        wts_ref = refs[-1]
    else:
        bcast, summ = refs[len(names):len(names) + 2]
        out_ref, wts_ref = refs[-2], refs[-1]
    from .fused_mlp_t import _mm_hilo_lhs

    z = z_ref[0]  # (1, L)
    if spec.ablate == "io_nowts":
        wts_ref = refs[-1]
        wts_ref[0] = z * od_ref[0][0:1, 0:1]
        return
    if spec.ablate == "io_min":
        wts_ref[0] = z * od_ref[0][0:1, 0:1]
        if not spec.sigma_only:
            out_ref[0] = jnp.zeros_like(out_ref[0]) + od_ref[0][0, 0]
        return
    if spec.ablate == "io_noexpand":
        # measurement-only: skip the expand, keep everything else (stays
        # data-dependent on od so nothing constant-folds)
        seg = jnp.broadcast_to(od_ref[0][:, 0:1], (9, z.shape[-1]))
    else:
        # one-hot expand: BCAST is exactly bf16-representable (0/1) but od
        # carries fp32 positions — hi/lo split keeps ~16 mantissa bits (a
        # DEFAULT-precision matmul truncates positions to bf16: ~2 fine grid
        # cells of error at G=512)
        seg = _mm_hilo_lhs(od_ref[0], bcast[...], spec.jdtype)  # (9, L)
    x3 = seg[0:3, :] + seg[3:6, :] * z  # already scaled to [0, 1]
    fspec = spec
    if spec.ablate in ("io_noexpand", "io_noscan"):
        import dataclasses as _dc

        fspec = _dc.replace(spec, ablate="io")
    sigma, rows = _field_rows(fspec, w, x3, seg[6:9, :])

    lanes = z.shape[-1]
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1) % spec.samples
    # z[i+1] via a cyclic rotate (pltpu.roll wants non-negative shifts:
    # left-by-1 == right-by-(lanes-1)); the wrapped lane is masked to 1e10
    dl = jnp.where(pos == spec.samples - 1, 1e10,
                   pltpu.roll(z, lanes - 1, 1) - z)
    sd = dl * _act_density(sigma, spec.sigma_act)
    wts = sd if spec.ablate == "io_noscan" else _prefix_weights(
        sd, spec.samples)
    wts_ref[0] = wts
    if spec.sigma_only:
        return
    vals = jnp.concatenate(
        [jnp.ones_like(sigma), rows[1:8, :], z], axis=0)  # (9, L)
    pmap = _mm((vals * wts).astype(jnp.float32), summ[...])  # (9, R)
    out_ref[0] = jnp.pad(pmap, ((0, 16 - pmap.shape[0]), (0, 0)))


@functools.partial(jax.jit, static_argnames=("spec", "interpret"))
def fused_cp_forward_composite_rays(packed: dict, od, z_row,
                                    spec: CPFusedSpec,
                                    interpret: bool = False):
    """Ray-input composite mode: od (NB, 9, R) per-ray rows + z (NB, 1, L).
    Returns (per_ray (NB, 16, R) or None, weights (NB, 1, L))."""
    from .fused_mlp_t import _sum_const

    nb, nine, r = od.shape
    assert nine == 9 and r == spec.rays_per_block
    lanes = spec.lanes
    if spec.ablate == "io_nowts":
        # measurement-only: no weight/const inputs at all
        assert spec.sigma_only
        names, consts = [], []
    else:
        names = sorted(packed.keys())
        summ_np = _sum_const(lanes, spec.samples)
        consts = [jnp.asarray(summ_np.T.copy(), jnp.float32)]  # BCAST (R, L)
        if not spec.sigma_only:
            consts.append(jnp.asarray(summ_np, spec.jdtype))
    blk_od = pl.BlockSpec((1, 9, r), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    blk1 = pl.BlockSpec((1, 1, lanes), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    w_specs = [pl.BlockSpec(packed[nm].shape,
                            (lambda i: (0, 0)) if packed[nm].ndim == 2
                            else (lambda i: (0,)),
                            memory_space=pltpu.VMEM) for nm in names]
    c_specs = [pl.BlockSpec(c.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM) for c in consts]
    kern = functools.partial(_kernel_composite_rays, spec, names)
    wts_shape = jax.ShapeDtypeStruct((nb, 1, lanes), jnp.float32)
    wts_spec = pl.BlockSpec((1, 1, lanes), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    ins = [od, z_row, *[packed[nm] for nm in names], *consts]
    in_specs = [blk_od, blk1, *w_specs, *c_specs]
    if spec.sigma_only:
        wts = pl.pallas_call(kern, grid=(nb,), in_specs=in_specs,
                             out_specs=wts_spec, out_shape=wts_shape,
                             interpret=interpret,
        compiler_params=_PARALLEL)(*ins)
        return None, wts
    per_ray, wts = pl.pallas_call(
        kern, grid=(nb,), in_specs=in_specs,
        out_specs=[pl.BlockSpec((1, 16, r), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM), wts_spec],
        out_shape=[jax.ShapeDtypeStruct((nb, 16, r), jnp.float32),
                   wts_shape],
        interpret=interpret,
        compiler_params=_PARALLEL)(*ins)
    return per_ray, wts


@functools.partial(jax.jit, static_argnames=("spec", "interpret"))
def fused_cp_forward(packed: dict, x3: jnp.ndarray, d3: jnp.ndarray,
                     spec: CPFusedSpec, interpret: bool = False):
    """x3, d3: (NB, 3, L) fp32 — axis-major sample blocks.
    Returns (NB, 8, L) fp32: rows σ, rgb·3, normal·3, mirror (FINAL)."""
    nb, _, lanes = x3.shape
    assert lanes == spec.lanes
    names = sorted(packed.keys())
    blk3 = pl.BlockSpec((1, 3, lanes), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    w_specs = [pl.BlockSpec(packed[nm].shape,
                            (lambda i: (0, 0)) if packed[nm].ndim == 2
                            else (lambda i: (0,)),
                            memory_space=pltpu.VMEM) for nm in names]
    return pl.pallas_call(
        functools.partial(_kernel, spec, names),
        grid=(nb,),
        in_specs=[blk3, blk3, *w_specs],
        out_specs=pl.BlockSpec((1, 8, lanes), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, 8, lanes), jnp.float32),
        interpret=interpret,
        compiler_params=_PARALLEL,
    )(x3, d3, *[packed[nm] for nm in names])


@functools.partial(jax.jit, static_argnames=("spec", "interpret"))
def fused_cp_forward_composite(packed: dict, x3, d3, z_row, dl_row,
                               spec: CPFusedSpec, interpret: bool = False):
    """Composite mode: returns (per_ray (NB, 16, R) or None,
    weights (NB, 1, L))."""
    from .fused_mlp_t import _sum_const

    nb, _, lanes = x3.shape
    assert lanes == spec.lanes
    r = spec.rays_per_block
    names = sorted(packed.keys())
    consts = []
    if not spec.sigma_only:
        consts.append(jnp.asarray(_sum_const(lanes, spec.samples),
                                  spec.jdtype))
    blk3 = pl.BlockSpec((1, 3, lanes), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    blk1 = pl.BlockSpec((1, 1, lanes), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    w_specs = [pl.BlockSpec(packed[nm].shape,
                            (lambda i: (0, 0)) if packed[nm].ndim == 2
                            else (lambda i: (0,)),
                            memory_space=pltpu.VMEM) for nm in names]
    c_specs = [pl.BlockSpec(c.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM) for c in consts]
    kern = functools.partial(_kernel_composite, spec, names)
    wts_shape = jax.ShapeDtypeStruct((nb, 1, lanes), jnp.float32)
    wts_spec = pl.BlockSpec((1, 1, lanes), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    ins = [x3, d3, z_row, dl_row, *[packed[nm] for nm in names], *consts]
    in_specs = [blk3, blk3, blk1, blk1, *w_specs, *c_specs]
    if spec.sigma_only:
        wts = pl.pallas_call(kern, grid=(nb,), in_specs=in_specs,
                             out_specs=wts_spec, out_shape=wts_shape,
                             interpret=interpret,
        compiler_params=_PARALLEL)(*ins)
        return None, wts
    per_ray, wts = pl.pallas_call(
        kern, grid=(nb,), in_specs=in_specs,
        out_specs=[pl.BlockSpec((1, 16, r), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM), wts_spec],
        out_shape=[jax.ShapeDtypeStruct((nb, 16, r), jnp.float32),
                   wts_shape],
        interpret=interpret,
        compiler_params=_PARALLEL)(*ins)
    return per_ray, wts


def fused_cp_rays_composite(field, params: dict, rays_o, rays_d, view_dirs,
                            z_vals, sigma_only: bool = False,
                            interpret: bool = None, lanes: int = None,
                            drop_levels: int = 0,
                            sigma_act: str = "relu"):
    """Composite-mode adapter (same contract as
    fused_mlp_t.fused_t_rays_eval): weights (N, S) always; plus per-ray
    opacity/rgb/normal/mirror/depth unless sigma_only. Eval semantics
    (no σ noise).

    `drop_levels` (proposal-lite): evaluate with the finest `drop_levels`
    CP levels truncated (tables + fold columns) — used by the σ-only
    proposal pass only; see RenderSettings.proposal_drop."""
    import os

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, s = z_vals.shape
    lanes = lanes or int(os.environ.get("MNERF_CP_LANES", LANES))
    if lanes % s != 0:
        lanes = s * max(1, lanes // s)
    ray_inputs = os.environ.get("MNERF_CP_RAYMODE", "1") != "0"
    n_levels = len(field.grid_levels) - drop_levels
    assert n_levels >= 1, "proposal_drop must keep at least one CP level"
    import os as _dbg_os
    if _dbg_os.environ.get("MNERF_DBG_DROP"):
        print(f"[dbg] composite trace: sigma_only={sigma_only} drop={drop_levels} n_levels={n_levels}", flush=True)
    spec = CPFusedSpec(
        levels=tuple(field.grid_levels)[:n_levels], sigma_only=sigma_only,
        predict_normal=field.predict_normal,
        predict_mirror_mask=field.predict_mirror_mask,
        dtype="float32" if interpret else "bfloat16",
        lanes=lanes, samples=s,
        basis=os.environ.get("MNERF_CP_BASIS", "hat"),
        ray_inputs=ray_inputs, sigma_act=sigma_act,
    )
    rpb = spec.rays_per_block
    n_pad = (n + rpb - 1) // rpb * rpb
    pad2 = ((0, n_pad - n), (0, 0))
    o = jnp.pad(rays_o.astype(jnp.float32), pad2)
    d = jnp.pad(rays_d.astype(jnp.float32), pad2)
    v = jnp.pad(view_dirs.astype(jnp.float32), pad2)
    z = jnp.pad(z_vals.astype(jnp.float32), ((0, n_pad - n), (0, 0)),
                constant_values=1.0)
    inv2b = 1.0 / (2.0 * field.bound)
    z_row = _axis_blocks([z], spec.lanes)
    packed = pack_cp_params(params, field, lanes=spec.lanes,
                            dtype=spec.jdtype, basis=spec.basis,
                            n_levels=n_levels)
    if ray_inputs:
        # per-ray (NB, 9, R) rows: scaled origin, scaled dir, view dir —
        # x3/d3/δ are built inside the kernel (32 B/sample -> ~4 B/sample)
        od = _axis_blocks(
            [(o[:, a] + field.bound) * inv2b for a in range(3)]
            + [d[:, a] * inv2b for a in range(3)]
            + [v[:, a] for a in range(3)], rpb)
        per_ray, wts = fused_cp_forward_composite_rays(
            packed, od, z_row, spec, interpret=interpret)
    else:
        deltas = jnp.concatenate(
            [z[:, 1:] - z[:, :-1], jnp.full_like(z[:, :1], 1e10)], axis=-1)
        x3 = _axis_blocks(
            [(o[:, a:a + 1] + d[:, a:a + 1] * z + field.bound) * inv2b
             for a in range(3)], spec.lanes)
        d3 = (jnp.zeros_like(x3) if sigma_only else _axis_blocks(
            [jnp.broadcast_to(v[:, a:a + 1], (n_pad, s)) for a in range(3)],
            spec.lanes))
        dl_row = _axis_blocks([deltas], spec.lanes)
        per_ray, wts = fused_cp_forward_composite(
            packed, x3, d3, z_row, dl_row, spec, interpret=interpret)
    res = {"weights": wts.reshape(-1)[:n * s].reshape(n, s)}
    if not sigma_only:
        pr = per_ray.transpose(1, 0, 2).reshape(16, -1)[:, :n]
        res.update(opacity=pr[0], rgb=pr[1:4].T, normal=pr[4:7].T,
                   mirror=pr[7], depth=pr[8])
    return res


def _to_blocks(x: jnp.ndarray, lanes: int) -> jnp.ndarray:
    """(T, 3) sample-major -> (NB, 3, L) axis-major blocks (zero-padded).

    Kept for generic inputs; prefer _axis_blocks for o/d/z ray inputs — a
    transpose whose minor dimension is 3 is a slow layout op on TPU."""
    t = x.shape[0]
    nb = (t + lanes - 1) // lanes
    x = jnp.pad(x.astype(jnp.float32), ((0, nb * lanes - t), (0, 0)))
    return x.reshape(nb, lanes, 3).transpose(0, 2, 1)


def _axis_blocks(comps, lanes: int) -> jnp.ndarray:
    """[3 × (N, S)] per-axis planes -> (NB, 3, L) axis-major blocks.

    Builds the axis-major layout directly from per-axis (N, S) arrays so no
    narrow-minor-dim transpose ever materializes: stack → (3, T) → block
    split → (NB, 3, L) via a transpose that moves whole L-contiguous rows.
    """
    x = jnp.stack([c.reshape(-1) for c in comps], axis=0)  # (C, T) fp32
    c, t = x.shape
    nb = (t + lanes - 1) // lanes
    x = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, nb * lanes - t)))
    return x.reshape(c, nb, lanes).transpose(1, 0, 2)


def fused_cp_rays_eval(field, params: dict, rays_o, rays_d, view_dirs,
                       z_vals, sigma_only: bool = False,
                       interpret: bool = None, lanes: int = None,
                       drop_levels: int = 0):
    """Ray-mode adapter: (N,3) o/d + (N,S) depths -> dict of per-sample
    outputs in sample-major layout: sigma (N,S) [+ rgb (N,S,3),
    normal (N,S,3), mirror (N,S)]. Forward-only. `drop_levels`: see
    fused_cp_rays_composite."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, s = z_vals.shape
    import os

    n_levels = len(field.grid_levels) - drop_levels
    assert n_levels >= 1, "proposal_drop must keep at least one CP level"
    spec = CPFusedSpec(
        levels=tuple(field.grid_levels)[:n_levels], sigma_only=sigma_only,
        predict_normal=field.predict_normal,
        predict_mirror_mask=field.predict_mirror_mask,
        dtype="float32" if interpret else "bfloat16",
        lanes=lanes or int(os.environ.get("MNERF_CP_LANES", LANES)),
        basis=os.environ.get("MNERF_CP_BASIS", "hat"),
    )
    inv2b = 1.0 / (2.0 * field.bound)
    x3 = _axis_blocks(
        [(rays_o[:, a:a + 1] + rays_d[:, a:a + 1] * z_vals + field.bound)
         * inv2b for a in range(3)], spec.lanes)
    if sigma_only:
        d3 = jnp.zeros_like(x3)  # never read
    else:
        d3 = _axis_blocks(
            [jnp.broadcast_to(view_dirs[:, a:a + 1], (n, s))
             for a in range(3)], spec.lanes)
    packed = pack_cp_params(params, field, lanes=spec.lanes,
                            dtype=spec.jdtype, basis=spec.basis,
                            n_levels=n_levels)
    out = fused_cp_forward(packed, x3, d3, spec, interpret=interpret)
    # (NB, 8, L) -> (8, T): move the 8 channel rows out, flatten blocks
    # (whole-L-row moves only; rgb/normal stay CHANNEL-major — a .T back to
    # (T, 3) would be a narrow-minor-dim transpose)
    rows = out.transpose(1, 0, 2).reshape(8, -1)[:, :n * s]
    res = {"sigma": rows[0].reshape(n, s)}
    if not sigma_only:
        res["rgb3"] = rows[1:4].reshape(3, n, s)
        res["normal3"] = rows[4:7].reshape(3, n, s)
        res["mirror"] = rows[7].reshape(n, s)
    return res
