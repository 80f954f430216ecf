"""Fully-fused MirrorNeRF field forward as a Pallas TPU kernel.

The TPU-native answer to tiny-cuda-nn's fully-fused MLP (the reference's
speed path imports tcnn, `models/mirror_nerf_tcnn.py:10`): the whole
8×256-with-skip trunk plus σ / rgb / pred-normal / mirror heads execute in
ONE kernel per point block. All weights (~0.7 MB bf16, padded to MXU-friendly
shapes) stay resident in VMEM across the grid; activations never touch HBM —
per sample only the embedded inputs stream in and one 128-lane output row
streams out, removing the ~16 layer-activation HBM round-trips of the unfused
path.

Design notes (what makes this version fast where the round-1 kernel wasn't):
  * Head outputs are LANE-PACKED AT WEIGHT-PACK TIME: the σ/rgb/normal/mirror
    output matrices are padded into disjoint lanes of (·, 128) operands, so
    the kernel's final row is a *sum of four matmuls* — no iota/where/roll
    vector passes.
  * The nonlinear epilogue (sigmoids, normal normalization) runs OUTSIDE the
    kernel on the sliced (N, 8) columns — in-kernel it would burn VPU
    transcendentals on 120 padding lanes.
  * The block is processed as `spec.interleave` independent sub-tiles with
    the layer loop outermost, so the Mosaic scheduler can overlap one
    sub-tile's MXU matmul with the other's VPU bias+ReLU.
  * Skip connections are split matmuls (XE @ W_a + H @ W_b): no lane-dim
    concatenation.

Numerics: bf16 operands on the MXU with fp32 accumulation; the packed output
row is fp32. Inputs are bf16 — bit-identical to the unfused bf16 path, which
also casts the fp32 positional encoding to bf16 before the first matmul.

Forward-only (the eval/bench path); training keeps the autodiff XLA field.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

XE_DIM = 128  # padded xyz-embedding lanes (63 real for N_emb_xyz=10)
DE_DIM = 128  # padded dir-embedding lanes (27 real for N_emb_dir=4)
OUT_DIM = 128  # padded output lanes (8 real: σ, rgb, normal, mirror)
TILE = 1024  # default points per grid step

# Grid iterations are independent blocks: declaring the (single) grid
# dimension "parallel" lets Mosaic overlap each block's HBM<->VMEM DMAs
# with the previous block's compute (double-buffering) instead of
# serializing them — this is the per-grid-step fixed cost the io-floor
# ablation measures (BASELINE.md, ~4.5 us/step at lanes=4096).
_PARALLEL = pltpu.CompilerParams(dimension_semantics=("parallel",))



@dataclass(frozen=True)
class FusedSpec:
    width: int = 256
    depth: int = 8
    skips: tuple = (4,)
    sigma_only: bool = False
    predict_normal: bool = True
    predict_mirror_mask: bool = True
    tile: int = TILE
    interleave: int = 1  # independent sub-tiles per grid step
    samples: int = 0  # >0: ray mode (samples per ray; tile = rays/blk * S)
    # apply the nonlinear epilogue in-kernel: sigmoid on the rgb/mirror lanes,
    # l2-normalization on the normal lanes (σ stays raw). The packed output
    # row is then FINAL — callers composite on it directly, never slicing
    # narrow columns out of the wide array (a narrow slice of a (B, 128)
    # array re-reads every 128-lane tile; measured ~2.5 ms/GB each).
    epilogue: bool = True


def _pad_to(a, rows: int, cols: int, row0: int = 0, col0: int = 0):
    a = jnp.asarray(a, jnp.float32)
    return jnp.pad(a, ((row0, rows - row0 - a.shape[0]),
                       (col0, cols - col0 - a.shape[1])))


def pack_params(params: dict, in_xyz: int = 63, in_dir: int = 27,
                width: int = 256, depth: int = 8, skips=(4,),
                dtype=jnp.bfloat16) -> dict:
    """Pad/split/lane-pack a MirrorNeRFField param pytree for the fused
    kernel. Pure jnp — safe to call inside jit (XLA hoists it for constant
    params; for traced params it is ~1 MB of padding work per call)."""
    W = width
    packed = {}
    # trunk: layer 0 consumes XE; skip layers are split into (XE, H) parts
    packed["w0"] = _pad_to(params["trunk"][0]["w"], XE_DIM, W)
    packed["b0"] = _pad_to(params["trunk"][0]["b"][None], 1, W)
    for i in range(1, depth):
        w = jnp.asarray(params["trunk"][i]["w"], jnp.float32)
        if i in skips:
            packed[f"w{i}a"] = _pad_to(w[:in_xyz], XE_DIM, W)
            packed[f"w{i}b"] = _pad_to(w[in_xyz:], W, W)
        else:
            packed[f"w{i}"] = _pad_to(w, W, W)
        packed[f"b{i}"] = _pad_to(params["trunk"][i]["b"][None], 1, W)
    # σ head: lane 0 of the packed output row
    packed["wsig"] = _pad_to(params["sigma"]["w"], W, OUT_DIM)
    # rgb path
    packed["wxf"] = _pad_to(params["xyz_final"]["w"], W, W)
    packed["bxf"] = _pad_to(params["xyz_final"]["b"][None], 1, W)
    wd = jnp.asarray(params["dir_enc"]["w"], jnp.float32)  # (W + in_dir, W//2)
    packed["wda"] = _pad_to(wd[:W], W, W // 2)
    packed["wdb"] = _pad_to(wd[W:], DE_DIM, W // 2)
    packed["bd"] = _pad_to(params["dir_enc"]["b"][None], 1, W // 2)
    # rgb head: lanes 1..3
    packed["wrgb"] = _pad_to(params["rgb"]["w"], W // 2, OUT_DIM, col0=1)
    # packed output bias row (fp32): σ lane 0, rgb lanes 1:4, normal 4:7,
    # mirror lane 7
    bout = _pad_to(params["sigma"]["b"][None], 1, OUT_DIM)
    bout = bout + _pad_to(params["rgb"]["b"][None], 1, OUT_DIM, col0=1)
    if "normal" in params:
        packed["wn1"] = _pad_to(params["normal"][0]["w"], W, W // 2)
        packed["bn1"] = _pad_to(params["normal"][0]["b"][None], 1, W // 2)
        packed["wn2"] = _pad_to(params["normal"][1]["w"], W // 2, OUT_DIM,
                                col0=4)
        bout = bout + _pad_to(params["normal"][1]["b"][None], 1, OUT_DIM,
                              col0=4)
    if "is_mirror" in params:
        packed["wm1"] = _pad_to(params["is_mirror"][0]["w"], W, W // 2)
        packed["bm1"] = _pad_to(params["is_mirror"][0]["b"][None], 1, W // 2)
        packed["wm2"] = _pad_to(params["is_mirror"][1]["w"], W // 2, OUT_DIM,
                                col0=7)
        bout = bout + _pad_to(params["is_mirror"][1]["b"][None], 1, OUT_DIM,
                              col0=7)
    packed["bout"] = bout
    return {k: v.astype(dtype) if k.startswith("w") else v
            for k, v in packed.items()}


def _mm(a, w):
    return jnp.dot(a, w, preferred_element_type=jnp.float32)


@functools.lru_cache(maxsize=None)
def _enc_consts_np(in_dim: int, n_freqs: int, lanes: int):
    """(lanes, lanes) fp32 matrix + (1, lanes) phase row such that, for x
    lane-padded to `lanes` with the raw coords in lanes 0:in_dim,
      enc = x @ M + phase;  out = where(lane < in_dim, enc, sin(enc))
    reproduces posenc() (raw coords then interleaved sin/cos), zero-padded to
    `lanes`. Identity columns carry the raw lanes; padding lanes give
    sin(0) = 0."""
    import numpy as np

    from ...models.embedding import _posenc_consts, posenc_dim

    M, phase = _posenc_consts(in_dim, n_freqs, True)
    out_cols = posenc_dim(in_dim, n_freqs)
    Mf = np.zeros((lanes, lanes), np.float32)
    Mf[:in_dim, :in_dim] = np.eye(in_dim, dtype=np.float32)
    Mf[:in_dim, in_dim:out_cols] = M
    ph = np.zeros((1, lanes), np.float32)
    ph[0, in_dim:out_cols] = phase
    return Mf, ph


def _apply_enc(x128, M, ph, in_dim: int, fp32_dots: bool = False):
    """In-kernel positional encoding: x128 (rows, lanes) fp32 -> bf16.

    On the MXU a DEFAULT-precision fp32 dot truncates its operands to
    bf16 — quantizing the POSITIONS to 8 mantissa bits before sin(2^k·x)
    garbles the high-frequency bands. M's entries are 0/±2^k (exact in
    bf16), so a hi/lo split of x recovers ~16 mantissa bits
    (fused_mlp_t._mm_hilo). fp32_dots=True (interpret mode) skips the
    split — there is no truncation, and XLA:CPU cannot run bf16 dots.
    """
    if fp32_dots:
        enc = jnp.dot(x128, M, preferred_element_type=jnp.float32) + ph
    else:
        hi = x128.astype(jnp.bfloat16)
        lo = (x128 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        Mb = M.astype(jnp.bfloat16)
        enc = (jnp.dot(hi, Mb, preferred_element_type=jnp.float32)
               + jnp.dot(lo, Mb, preferred_element_type=jnp.float32) + ph)
    lanes = jax.lax.broadcasted_iota(jnp.int32, enc.shape, 1)
    return jnp.where(lanes < in_dim, enc, jnp.sin(enc)).astype(jnp.bfloat16)


def _trunk(spec: FusedSpec, w: dict, xe):
    bf = jnp.bfloat16
    h = jnp.maximum(_mm(xe, w["w0"]) + w["b0"], 0.0).astype(bf)
    for i in range(1, spec.depth):
        if i in spec.skips:
            acc = _mm(xe, w[f"w{i}a"]) + _mm(h, w[f"w{i}b"])
        else:
            acc = _mm(h, w[f"w{i}"])
        h = jnp.maximum(acc + w[f"b{i}"], 0.0).astype(bf)
    return h


def _heads(spec: FusedSpec, w: dict, h, de):
    """Packed fp32 output row from trunk features (+ dir encoding)."""
    bf = jnp.bfloat16
    xf = (_mm(h, w["wxf"]) + w["bxf"]).astype(bf)
    hd = jnp.maximum(
        _mm(xf, w["wda"]) + _mm(de, w["wdb"]) + w["bd"], 0.0
    ).astype(bf)
    out = _mm(h, w["wsig"]) + _mm(hd, w["wrgb"]) + w["bout"]
    if spec.predict_normal:
        hn = (_mm(h, w["wn1"]) + w["bn1"]).astype(bf)
        out = out + _mm(hn, w["wn2"])
    if spec.predict_mirror_mask:
        hm = _mm(h, w["wm1"]) + w["bm1"]
        hm = jnp.where(hm >= 0, hm, 0.01 * hm).astype(bf)
        out = out + _mm(hm, w["wm2"])
    if spec.epilogue:
        lanes = jax.lax.broadcasted_iota(jnp.int32, out.shape, 1)
        sigm = ((lanes >= 1) & (lanes < 4)) | (lanes == 7)
        out = jnp.where(sigm, jax.nn.sigmoid(out), out)
        if spec.predict_normal:
            nm = (lanes >= 4) & (lanes < 7)
            nsq = jnp.sum(jnp.where(nm, out * out, 0.0), axis=1,
                          keepdims=True)
            inv = jax.lax.rsqrt(jnp.maximum(nsq, 1.1920929e-07))
            out = jnp.where(nm, out * inv, out)
    return out


def _kernel(spec: FusedSpec, names, xe_ref, de_ref, *w_refs):
    out_ref = w_refs[-1]
    w = {n: r[...] for n, r in zip(names, w_refs[:-1])}
    P = spec.interleave
    T2 = spec.tile // P
    for j in range(P):
        xe = xe_ref[j * T2:(j + 1) * T2, :]
        h = _trunk(spec, w, xe)
        if spec.sigma_only:
            out = _mm(h, w["wsig"]) + w["bout"]
        else:
            out = _heads(spec, w, h, de_ref[j * T2:(j + 1) * T2, :])
        out_ref[j * T2:(j + 1) * T2, :] = out.astype(out_ref.dtype)


def _kernel_rays(spec: FusedSpec, names, fp32_dots, o_ref, d_ref, z_ref,
                 de_ref, mpos_ref, ppos_ref, *w_refs):
    """Ray-mode kernel: builds xyz = o + d·z and its positional encoding in
    VMEM from per-ray inputs, so the dominant per-SAMPLE input tensor never
    crosses HBM (a per-sample (B,3) xyz is lane-padded to 128 on TPU — a 42x
    physical blowup the from-points path pays). The much smaller view-dir
    encoding streams in per-sample (de_ref): constructing it in-kernel from
    per-ray rows measured ~8x slower than the whole rest of the kernel —
    Mosaic lowers the ray->sample sublane broadcast of *loaded data* badly,
    while the arithmetic o + d·z broadcast is free."""
    out_ref = w_refs[-1]
    w = {n: r[...] for n, r in zip(names, w_refs[:-1])}
    T = spec.tile

    z3 = z_ref[...][:, :, None]  # (R, S, 1): depth broadcast over lanes
    xyz = (o_ref[...][:, None, :] + d_ref[...][:, None, :] * z3
           ).reshape(T, 128)  # lanes 0:3 real, rest zero
    xe = _apply_enc(xyz, mpos_ref[...], ppos_ref[...], 3,
                    fp32_dots=fp32_dots)
    h = _trunk(spec, w, xe)
    if spec.sigma_only:
        out = _mm(h, w["wsig"]) + w["bout"]
    else:
        out = _heads(spec, w, h, de_ref[...])
    out_ref[...] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("spec", "interpret"))
def fused_forward(packed: dict, xe: jnp.ndarray, de: jnp.ndarray,
                  spec: FusedSpec, interpret: bool = False):
    """Run the fused field on embedded (bf16, lane-padded) inputs.

    Args:
      packed: pack_params output.
      xe: (B, XE_DIM) padded xyz embedding (B multiple of spec.tile).
      de: (B, DE_DIM) padded dir embedding.
    Returns:
      (B, OUT_DIM) bf16 packed rows: lane 0 raw σ, 1:4 rgb, 4:7 pred-normal,
      7 mirror prob. With spec.epilogue (default) the sigmoids/normalization
      are already applied and the rows are final; otherwise lanes 1:4 and 7
      are logits and 4:7 unnormalized.
    """
    b = xe.shape[0]
    assert b % spec.tile == 0, f"batch {b} not a multiple of {spec.tile}"
    names = sorted(packed.keys())
    grid = (b // spec.tile,)
    # weights: full arrays, same block each step (resident in VMEM)
    w_specs = [
        pl.BlockSpec(packed[n].shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM) for n in names
    ]
    kernel = functools.partial(_kernel, spec, names)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((spec.tile, XE_DIM), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((spec.tile, DE_DIM), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=pl.BlockSpec((spec.tile, OUT_DIM), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, OUT_DIM), jnp.bfloat16),
        interpret=interpret,
        compiler_params=_PARALLEL,
    )(xe, de, *[packed[n] for n in names])


@functools.partial(jax.jit, static_argnames=("spec", "n_emb_xyz",
                                              "interpret"))
def fused_forward_rays(packed: dict, o: jnp.ndarray, d: jnp.ndarray,
                       z: jnp.ndarray, de: jnp.ndarray, spec: FusedSpec,
                       n_emb_xyz: int, interpret: bool = False):
    """Ray-mode fused field: per-ray origins/dirs + per-ray depths in,
    packed per-sample rows out.

    Args:
      packed: pack_params output.
      o, d: (N, 128) fp32, world coords in lanes 0:3.
      z: (N, S) fp32 sample depths, S == spec.samples.
      de: (N*S, DE_DIM) bf16 per-sample dir encoding (pass a (8, DE_DIM)
        dummy when spec.sigma_only — it is never read).
    Returns:
      (N*S, OUT_DIM) bf16 packed rows in ray-major order (see fused_forward).
    """
    n, s = z.shape
    assert s == spec.samples and spec.tile % s == 0
    r_blk = spec.tile // s
    assert n % r_blk == 0, f"rays {n} not a multiple of {r_blk}"
    names = sorted(packed.keys())
    grid = (n // r_blk,)
    mpos, ppos = _enc_consts_np(3, n_emb_xyz, XE_DIM)
    const = [jnp.asarray(a) for a in (mpos, ppos)]
    const_specs = [pl.BlockSpec(c.shape, lambda i: (0, 0),
                                memory_space=pltpu.VMEM) for c in const]
    w_specs = [pl.BlockSpec(packed[nm].shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM) for nm in names]
    ray_spec = pl.BlockSpec((r_blk, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    z_spec = pl.BlockSpec((r_blk, s), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    if spec.sigma_only:
        de_spec = pl.BlockSpec((8, DE_DIM), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
    else:
        de_spec = pl.BlockSpec((spec.tile, DE_DIM), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel_rays, spec, names, interpret)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[ray_spec, ray_spec, z_spec, de_spec, *const_specs,
                  *w_specs],
        out_specs=pl.BlockSpec((spec.tile, OUT_DIM), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n * s, OUT_DIM), jnp.bfloat16),
        interpret=interpret,
        compiler_params=_PARALLEL,
    )(o, d, z, de, *const, *[packed[nm] for nm in names])


def _pad_rays(x: jnp.ndarray, rows: int) -> jnp.ndarray:
    """(N, 3) fp32 -> (rows, 128) fp32, coords in lanes 0:3."""
    n = x.shape[0]
    return jnp.pad(x.astype(jnp.float32), ((0, rows - n), (0, 128 - 3)))


def fused_rays_eval(field, params: dict, rays_o, rays_d, view_dirs, z_vals,
                    sigma_only: bool = False, interpret: bool = None,
                    rays_per_block: int = None):
    """High-level ray-mode adapter: (N,3) origins/dirs + (N,S) depths ->
    (N*S, OUT_DIM) bf16 packed FINAL rows (ray-major). The per-sample xyz,
    its positional encoding, and the view-dir encoding are all built inside
    the kernel. Forward-only."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, s = z_vals.shape
    r_blk = rays_per_block or max(1, min(TILE, 2048) // s)
    spec = FusedSpec(
        width=field.width, depth=field.depth, skips=tuple(field.skips),
        sigma_only=sigma_only, predict_normal=field.predict_normal,
        predict_mirror_mask=field.predict_mirror_mask,
        tile=r_blk * s, samples=s,
    )
    n_pad = (n + r_blk - 1) // r_blk * r_blk
    o = _pad_rays(rays_o, n_pad)
    d = _pad_rays(rays_d, n_pad)
    z = jnp.pad(z_vals.astype(jnp.float32), ((0, n_pad - n), (0, 0)),
                constant_values=1.0)
    if sigma_only:
        de = jnp.zeros((8, DE_DIM), jnp.bfloat16)  # never read
    else:
        from ...models.embedding import posenc

        # per-RAY dir encoding, broadcast to per-sample in XLA (128-lane
        # bf16 — no narrow-array tax; in-kernel construction lowers badly)
        de_r = jnp.pad(posenc(view_dirs, field.N_emb_dir).astype(
            jnp.bfloat16), ((0, n_pad - n), (0, DE_DIM - field.in_dir)))
        de = jnp.broadcast_to(de_r[:, None, :], (n_pad, s, DE_DIM)
                              ).reshape(n_pad * s, DE_DIM)
    rows = fused_forward_rays(packed=pack_params(
        params, in_xyz=field.in_xyz, in_dir=field.in_dir, width=field.width,
        depth=field.depth, skips=tuple(field.skips)),
        o=o, d=d, z=z, de=de, spec=spec, n_emb_xyz=field.N_emb_xyz,
        interpret=interpret)
    return rows[:n * s]


def pad_batch(x: jnp.ndarray, lanes: int, tile: int = TILE,
              dtype=jnp.bfloat16) -> jnp.ndarray:
    """Pad (B, C) to (ceil(B/tile)*tile, lanes) and cast for the kernel."""
    b, c = x.shape
    bp = (b + tile - 1) // tile * tile
    return jnp.pad(x, ((0, bp - b), (0, lanes - c))).astype(dtype)


def fused_packed_eval(field, params: dict, xyz: jnp.ndarray, dirs=None,
                      sigma_only: bool = False, interpret: bool = None):
    """Raw (N,3) coords [+ (N,3) unit dirs] -> (N, OUT_DIM) bf16 FINAL rows:
    lane 0 raw σ, 1:4 rgb, 4:7 unit pred-normal, 7 mirror prob, rest zero.

    The renderer's fused eval path composites directly on these rows (the
    per-sample nonlinearities are already applied in-kernel), extracting
    per-ray values only after the sample-axis reduction. Forward-only — do
    not differentiate.
    """
    from ...models.embedding import posenc

    if interpret is None:  # auto: interpreter off-TPU (CPU tests)
        interpret = jax.default_backend() != "tpu"
    n = xyz.shape[0]
    spec = FusedSpec(
        width=field.width, depth=field.depth, skips=tuple(field.skips),
        sigma_only=sigma_only, predict_normal=field.predict_normal,
        predict_mirror_mask=field.predict_mirror_mask,
        tile=min(TILE, max(128, (n + 127) // 128 * 128)),
    )
    packed = pack_params(params, in_xyz=field.in_xyz, in_dir=field.in_dir,
                         width=field.width, depth=field.depth,
                         skips=tuple(field.skips))
    xe = pad_batch(posenc(xyz, field.N_emb_xyz), XE_DIM, spec.tile)
    if sigma_only:
        de = jnp.zeros_like(xe[:, :DE_DIM])
    else:
        de = pad_batch(posenc(dirs, field.N_emb_dir), DE_DIM, spec.tile)
    return fused_forward(packed, xe, de, spec, interpret=interpret)[:n]


def fused_field_eval(field, params: dict, xyz: jnp.ndarray, dirs=None,
                     sigma_only: bool = False, interpret: bool = None):
    """Like fused_packed_eval but unpacked into separate arrays:
      sigma_only: (sigma,)
      else:       (sigma, rgb, unit pred_normal | None, mirror prob | None)

    Matches MirrorNeRFField.density/color/normal_head/mirror_head composed,
    within bf16 tolerance. Convenience/test API — the renderer uses the
    packed form (column slices of a wide array re-read whole tiles).
    """
    out = fused_packed_eval(field, params, xyz, dirs, sigma_only, interpret)
    sigma = out[:, 0].astype(jnp.float32)
    if sigma_only:
        return (sigma,)
    rgb = out[:, 1:4].astype(jnp.float32)
    normal = out[:, 4:7].astype(jnp.float32) if field.predict_normal else None
    mirror = (out[:, 7].astype(jnp.float32) if field.predict_mirror_mask
              else None)
    return sigma, rgb, normal, mirror
