"""Transposed fused kernel for the flagship PE-MLP field, with in-kernel
volume compositing.

Second-generation eval kernel for `MirrorNeRFField` (first: fused_mlp.py's
ray-mode rows kernel). Like the CP kernel (fused_cp.py) it runs
feature-major — samples on lanes (blocks of L), channels on sublanes — which
turns every awkward step of the rows orientation into a matmul or row
arithmetic:

  * positional encoding is  sin(E @ x3 + phase)  with E a constant
    (enc_dim, 3) matrix — MXU, no lane extraction;
  * the 8×256 trunk and all heads are plain (out, in) @ (in, L) matmuls;
  * α-compositing happens IN-KERNEL: with sd = δ·relu(σ) as a (1, L) row,
    transmittance is exp(−sd @ TRI) where TRI is a constant strictly-lower
    block-diagonal (per-ray) triangular matrix — the cumulative product
    becomes one matmul — and the per-ray render is (8, L) ⊙ w @ SUM with a
    block-column summing matrix. The kernel's main output is PER-RAY
    (rows: opacity, rgb, normal, mirror, depth), 9 floats per ray instead
    of 128 per sample: the (N·S, 128) rows tensor of the first-generation
    kernel (268 MB/chunk at the fine level) never exists.

Per-sample weights are still emitted as a (1, L) row per block — the coarse
pass feeds them to the importance sampler; they also populate
results["weights_*"].

Exactness: transmittance uses exp(−Σ sd) where the XLA reference computes
cumprod(1 − α + 1e-10); these agree to ~S·1e-10 ≈ 1e-7 relative.
Forward-only, eval semantics (no σ noise). Reference capability:
rendering.py:182-199 compositing + the fused-eval role of tcnn.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 2048 measured +4% end-to-end over 1024 on the flagship bench (316.0k vs
# 303.0k rays/s); 4096 exceeds VMEM (the 8x256 trunk activations dominate).
LANES = 2048

# Grid iterations are independent blocks: declaring the (single) grid
# dimension "parallel" lets Mosaic overlap each block's HBM<->VMEM DMAs
# with the previous block's compute (double-buffering) instead of
# serializing them — this is the per-grid-step fixed cost the io-floor
# ablation measures (BASELINE.md, ~4.5 us/step at lanes=4096).
_PARALLEL = pltpu.CompilerParams(dimension_semantics=("parallel",))



@dataclass(frozen=True)
class TSpec:
    width: int = 256
    depth: int = 8
    skips: tuple = (4,)
    n_emb_xyz: int = 10
    n_emb_dir: int = 4
    samples: int = 128  # S; rays per block = lanes // S
    sigma_only: bool = False
    predict_normal: bool = True
    predict_mirror_mask: bool = True
    lanes: int = LANES
    dtype: str = "bfloat16"
    # σ -> density nonlinearity in the in-kernel compositing ("relu" |
    # "softplus"); see renderer.sigma_activation
    sigma_act: str = "relu"

    @property
    def jdtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32

    @property
    def rays_per_block(self) -> int:
        assert self.lanes % self.samples == 0
        return self.lanes // self.samples


@functools.lru_cache(maxsize=None)
def _enc_consts_t(in_dim: int, n_freqs: int, rows: int):
    """(rows, in_dim) matrix E + (rows, 1) phase such that for x3 of shape
    (in_dim, L):  enc = E @ x3 + phase;  out = where(row < in_dim, enc,
    sin(enc))  reproduces posenc() transposed, zero-padded to `rows`."""
    from ...models.embedding import _posenc_consts, posenc_dim

    M, phase = _posenc_consts(in_dim, n_freqs, True)  # (in, 2F·in), (2F·in,)
    out_rows = posenc_dim(in_dim, n_freqs)
    E = np.zeros((rows, in_dim), np.float32)
    E[:in_dim, :in_dim] = np.eye(in_dim, dtype=np.float32)
    E[in_dim:out_rows, :] = np.asarray(M, np.float32).T
    ph = np.zeros((rows, 1), np.float32)
    ph[in_dim:out_rows, 0] = np.asarray(phase, np.float32)
    return E, ph


def _sum_const(lanes: int, s: int):
    """SUM (lanes, R): block column matrix for per-ray sums —
    pmap = (vals ⊙ w) @ SUM."""
    jl = np.arange(lanes)
    r = lanes // s
    return (jl[:, None] // s == np.arange(r)[None, :]).astype(np.float32)


def _prefix_weights(sd, s: int):
    """sd (1, L) = δ·relu(σ) -> per-sample compositing weights (1, L):
    w_i = exp(−Σ_{j<i, same ray} sd_j)·(1 − exp(−sd_i)).

    The per-ray exclusive prefix is a segmented Hillis-Steele scan via
    lane rotations: ceil(log2(s)) masked roll-adds (~20 VPU row ops, no
    MXU work). This replaced a constant (lanes, lanes) block-diagonal
    triangular matmul, which — at M=1 — ran at 1/128 systolic-row
    utilization and measured as the entire composite-mode overhead
    (~1.6 ns/sample, tools/exp_cp_composite.py). The rotate's wraparound
    is masked: a lane with pos % s < k would pull from a previous ray (or
    wrap around the row), and the pos >= k mask excludes exactly those.
    """
    lanes = sd.shape[-1]
    x = sd.astype(jnp.float32)
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1) % s
    # Exclusive prefix = inclusive scan of the segment-shifted values
    # (cum_i = Σ_{j<i} sd_j, with sd_{-1} := 0 at each ray start). Do NOT
    # compute it as inclusive-minus-self: each ray's LAST sample carries the
    # reference's δ_inf = 1e10 sentinel (renderer._composite_weights), and
    # fp32 `(1e10 + prefix) − 1e10` cancels the whole prefix — the last
    # sample's weight then ignores transmittance entirely (measured: per-ray
    # Σw up to 2.0, held-out eval 7.9 dB vs 23 dB unfused).
    cum = jnp.where(pos >= 1, pltpu.roll(x, 1, 1), 0.0)
    k = 1
    while k < s:
        cum = cum + jnp.where(pos >= k, pltpu.roll(cum, k, 1), 0.0)
        k *= 2
    return jnp.exp(-cum) * (1.0 - jnp.exp(-x))


def pack_t_params(params: dict, spec: TSpec, in_xyz: int, in_dir: int,
                  dtype=jnp.bfloat16) -> dict:
    """Transpose/pad a MirrorNeRFField param pytree for the T kernel.

    All matrices (out, in); head outputs pre-placed into the 8-row packed
    space (0 σ, 1:4 rgb, 4:7 normal, 7 mirror). Biases are (rows, 1) —
    lane-broadcast by jnp inside the kernel.
    """
    W = spec.width
    XE = 128  # padded posenc rows (63 real)
    DE = 128  # padded dir-enc rows (27 real)

    def t(a, rows=None, cols=None, row0=0):
        a = jnp.asarray(a, jnp.float32).T  # (out, in)
        rows = rows or a.shape[0]
        cols = cols or a.shape[1]
        return jnp.pad(a, ((row0, rows - row0 - a.shape[0]),
                           (0, cols - a.shape[1])))

    def col(b, rows=None, row0=0):
        b = jnp.asarray(b, jnp.float32)[:, None]
        rows = rows or b.shape[0]
        return jnp.pad(b, ((row0, rows - row0 - b.shape[0]), (0, 0)))

    p = {"w0": t(params["trunk"][0]["w"], W, XE),
         "b0": col(params["trunk"][0]["b"])}
    for i in range(1, spec.depth):
        w = jnp.asarray(params["trunk"][i]["w"], jnp.float32)
        if i in spec.skips:
            p[f"w{i}a"] = t(w[:in_xyz], W, XE)
            p[f"w{i}b"] = t(w[in_xyz:], W, W)
        else:
            p[f"w{i}"] = t(w, W, W)
        p[f"b{i}"] = col(params["trunk"][i]["b"])
    # σ head -> packed row 0
    p["wsig"] = t(params["sigma"]["w"], 8, W)  # (1,W) placed at row 0
    obias = col(params["sigma"]["b"], 8, 0)
    wd = jnp.asarray(params["dir_enc"]["w"], jnp.float32)  # (W+in_dir, W//2)
    p["wda"] = t(wd[:W], W // 2, W)
    p["wdb"] = t(wd[W:], W // 2, DE)
    p["bd"] = col(params["dir_enc"]["b"])
    if "normal" in params and "is_mirror" in params:
        # PACKED heads: xf / normal-hidden / mirror-hidden all consume the
        # trunk feature h, so one (W + 2·W/2, W) matmul evaluates all three
        # (the separate matmuls are skinny: M ∈ {W/2}, MXU latency-bound);
        # the three 8-row finals consume disjoint slices of the stacked
        # hidden rows [hd; hn; hm], so one (8, 3·W/2) matmul finishes them.
        p["whd1"] = jnp.concatenate([
            t(params["xyz_final"]["w"], W, W),
            t(params["normal"][0]["w"], W // 2, W),
            t(params["is_mirror"][0]["w"], W // 2, W)], axis=0)  # (2W, W)
        p["bhd1"] = jnp.concatenate([
            col(params["xyz_final"]["b"]),
            col(params["normal"][0]["b"]),
            col(params["is_mirror"][0]["b"])], axis=0)
        p["wfin"] = jnp.concatenate([
            t(params["rgb"]["w"], 8, W // 2, row0=1),
            t(params["normal"][1]["w"], 8, W // 2, row0=4),
            t(params["is_mirror"][1]["w"], 8, W // 2, row0=7)],
            axis=1)  # (8, 3·W/2)
        obias = obias + col(params["rgb"]["b"], 8, 1)
        obias = obias + col(params["normal"][1]["b"], 8, 4)
        obias = obias + col(params["is_mirror"][1]["b"], 8, 7)
    else:
        p["wxf"] = t(params["xyz_final"]["w"], W, W)
        p["bxf"] = col(params["xyz_final"]["b"])
        p["wrgb"] = t(params["rgb"]["w"], 8, W // 2, row0=1)
        obias = obias + col(params["rgb"]["b"], 8, 1)
        if "normal" in params:
            p["wn1"] = t(params["normal"][0]["w"], W // 2, W)
            p["bn1"] = col(params["normal"][0]["b"])
            p["wn2"] = t(params["normal"][1]["w"], 8, W // 2, row0=4)
            obias = obias + col(params["normal"][1]["b"], 8, 4)
        if "is_mirror" in params:
            p["wm1"] = t(params["is_mirror"][0]["w"], W // 2, W)
            p["bm1"] = col(params["is_mirror"][0]["b"])
            p["wm2"] = t(params["is_mirror"][1]["w"], 8, W // 2, row0=7)
            obias = obias + col(params["is_mirror"][1]["b"], 8, 7)
    p["obias"] = obias
    return {k: v.astype(dtype) if k.startswith("w") else v
            for k, v in p.items()}


def _mm(w, x):
    # NOTE: on the TPU MXU, DEFAULT precision truncates fp32 operands to
    # bf16 (requesting Precision.HIGHEST fails to lower in Mosaic on this
    # toolchain); use _mm_hilo when the fp32 operand carries positions.
    return jax.lax.dot_general(w, x, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _mm_hilo(w, x, bf=jnp.bfloat16):
    """w @ x with the fp32 rhs split into bf16 hi + lo parts.

    The MXU truncates fp32 operands to bf16 at DEFAULT precision, and
    Mosaic cannot lower Precision.HIGHEST in-kernel. When `w` is exactly
    bf16-representable (one-hot expand matrices; posenc rows of 0/±2^k)
    and `x` carries POSITIONS, plain _mm silently quantizes the positions
    to 8 mantissa bits — e.g. sin(2^9·x) in the flagship posenc then sees
    multi-radian phase error, and CP grid samples shift by ~2 fine cells.
    Splitting x as hi = bf16(x), lo = bf16(x − hi) recovers ~16 mantissa
    bits at the cost of one extra (cheap, position-sized) matmul:
    w @ x ≈ w @ hi + w @ lo with fp32 accumulation.

    `bf` is the kernel's compute dtype: in fp32 (interpret) mode the MXU
    truncation doesn't exist — and XLA:CPU cannot execute bf16 dots — so
    the split is skipped.
    """
    if bf == jnp.float32:
        return _mm(w, x)
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)
    return _mm(wb, hi) + _mm(wb, lo)


def _mm_hilo_lhs(x, w, bf=jnp.bfloat16):
    """x @ w with the fp32 LHS hi/lo-split (see _mm_hilo; here the
    position-carrying operand is on the left, e.g. the CP ray-input
    expand od (9, R) @ BCAST (R, L))."""
    if bf == jnp.float32:
        return _mm(x, w)
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)
    return _mm(hi, wb) + _mm(lo, wb)


def _posenc_t(x3, E, ph, in_dim: int, bf):
    # hi/lo split: E rows are 0/±2^k (exact in bf16) but x3 carries fp32
    # positions — a DEFAULT-precision matmul would truncate them to 8
    # mantissa bits BEFORE sin(2^k·x), garbling the high-frequency bands
    enc = _mm_hilo(E, x3, bf) + ph
    row = jax.lax.broadcasted_iota(jnp.int32, enc.shape, 0)
    return jnp.where(row < in_dim, enc, jnp.sin(enc)).astype(bf)


def _kernel(spec: TSpec, names, x_ref, d_ref, z_ref, dl_ref, *refs):
    # refs = [*weights, *consts, *outputs]
    w = {n: r for n, r in zip(names, refs[:len(names)])}
    if spec.sigma_only:
        E, ph = refs[len(names):len(names) + 2]
        wts_ref = refs[-1]
    else:
        E, ph, Ed, phd, summ = refs[len(names):len(names) + 5]
        out_ref, wts_ref = refs[-2], refs[-1]
    bf = spec.jdtype

    xe = _posenc_t(x_ref[0], E[...], ph[...], 3, bf)  # (128, L)
    h = jnp.maximum(_mm(w["w0"][...], xe) + w["b0"][...], 0.0).astype(bf)
    for i in range(1, spec.depth):
        if i in spec.skips:
            acc = _mm(w[f"w{i}a"][...], xe) + _mm(w[f"w{i}b"][...], h)
        else:
            acc = _mm(w[f"w{i}"][...], h)
        h = jnp.maximum(acc + w[f"b{i}"][...], 0.0).astype(bf)

    out = _mm(w["wsig"][...], h) + w["obias"][...]  # (8, L), row 0 = σ raw
    sigma = out[0:1, :]

    # in-kernel compositing: sd = δ·relu(σ); per-ray exclusive prefix via
    # the segmented roll scan (see _prefix_weights)
    from .fused_cp import _act_density

    sd = dl_ref[0] * _act_density(sigma, spec.sigma_act)  # (1, L) fp32
    wts = _prefix_weights(sd, spec.samples)  # (1, L)
    wts_ref[0] = wts

    if spec.sigma_only:
        return

    de = _posenc_t(d_ref[0], Ed[...], phd[...], 3, bf)  # (128, L)
    if spec.predict_normal and spec.predict_mirror_mask:
        # packed: one (2W, W) matmul for xf + both head hiddens, one
        # (8, 3·W/2) final on the stacked hiddens (see pack_t_params)
        W, Wh = spec.width, spec.width // 2
        pre = _mm(w["whd1"][...], h) + w["bhd1"][...]  # (2W, L) fp32
        xf = pre[0:W, :].astype(bf)
        hn = pre[W:W + Wh, :].astype(bf)
        hm = pre[W + Wh:, :]
        hm = jnp.where(hm >= 0, hm, 0.01 * hm).astype(bf)
        hd = jnp.maximum(
            _mm(w["wda"][...], xf) + _mm(w["wdb"][...], de) + w["bd"][...],
            0.0).astype(bf)
        out = out + _mm(w["wfin"][...],
                        jnp.concatenate([hd, hn, hm], axis=0))
    else:
        xf = (_mm(w["wxf"][...], h) + w["bxf"][...]).astype(bf)
        hd = jnp.maximum(
            _mm(w["wda"][...], xf) + _mm(w["wdb"][...], de) + w["bd"][...],
            0.0).astype(bf)
        out = out + _mm(w["wrgb"][...], hd)
        if spec.predict_normal:
            hn = (_mm(w["wn1"][...], h) + w["bn1"][...]).astype(bf)
            out = out + _mm(w["wn2"][...], hn)
        if spec.predict_mirror_mask:
            hm = _mm(w["wm1"][...], h) + w["bm1"][...]
            hm = jnp.where(hm >= 0, hm, 0.01 * hm).astype(bf)
            out = out + _mm(w["wm2"][...], hm)

    # epilogue on rows, then per-ray composite via the SUM matmul
    rgb = jax.nn.sigmoid(out[1:4, :])
    n = out[4:7, :]
    nsq = jnp.sum(n * n, axis=0, keepdims=True)
    n = n * jax.lax.rsqrt(jnp.maximum(nsq, 1.1920929e-07))
    mir = jax.nn.sigmoid(out[7:8, :])
    vals = jnp.concatenate(
        [jnp.ones_like(sigma), rgb, n, mir, z_ref[0]], axis=0)  # (9, L)
    pmap = _mm((vals * wts).astype(jnp.float32), summ[...])  # (9, R)
    out_ref[0] = jnp.pad(pmap, ((0, 16 - pmap.shape[0]), (0, 0)))


@functools.partial(jax.jit, static_argnames=("spec", "interpret"))
def fused_t_forward(packed: dict, x3, d3, z_row, dl_row, spec: TSpec,
                    interpret: bool = False):
    """x3/d3: (NB, 1, 3, L) coord/dir blocks; z_row/dl_row: (NB, 1, 1, L)
    depth / interval rows. Returns (per_ray (NB, 16, R) or None,
    weights (NB, 1, L))."""
    nb = x3.shape[0]
    lanes, s = spec.lanes, spec.samples
    r = spec.rays_per_block
    names = sorted(packed.keys())
    E, ph = _enc_consts_t(3, spec.n_emb_xyz, 128)
    consts = [jnp.asarray(E), jnp.asarray(ph)]
    if not spec.sigma_only:
        Ed, phd = _enc_consts_t(3, spec.n_emb_dir, 128)
        consts += [jnp.asarray(Ed), jnp.asarray(phd)]
        consts.append(jnp.asarray(_sum_const(lanes, s), spec.jdtype))

    blk3 = pl.BlockSpec((1, 3, lanes), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    blk1 = pl.BlockSpec((1, 1, lanes), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    w_specs = [pl.BlockSpec(packed[nm].shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM) for nm in names]
    c_specs = [pl.BlockSpec(c.shape, lambda i: (0,) * c.ndim,
                            memory_space=pltpu.VMEM) for c in consts]
    wts_shape = jax.ShapeDtypeStruct((nb, 1, lanes), jnp.float32)
    wts_spec = pl.BlockSpec((1, 1, lanes), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def kern(x_ref, d_ref, z_ref, dl_ref, *refs):
        _kernel(spec, names, x_ref, d_ref, z_ref, dl_ref, *refs)

    if spec.sigma_only:
        return None, pl.pallas_call(
            kern,
            grid=(nb,),
            in_specs=[blk3, blk3, blk1, blk1, *w_specs, *c_specs],
            out_specs=wts_spec,
            out_shape=wts_shape,
            interpret=interpret,
            compiler_params=_PARALLEL,
        )(x3, d3, z_row, dl_row, *[packed[nm] for nm in names], *consts)
    per_ray, wts = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[blk3, blk3, blk1, blk1, *w_specs, *c_specs],
        out_specs=[pl.BlockSpec((1, 16, r), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM), wts_spec],
        out_shape=[jax.ShapeDtypeStruct((nb, 16, r), jnp.float32),
                   wts_shape],
        interpret=interpret,
        compiler_params=_PARALLEL,
    )(x3, d3, z_row, dl_row, *[packed[nm] for nm in names], *consts)
    return per_ray, wts


def _axis_blocks(comps, lanes):
    """[C × (N, S)] per-channel planes -> (NB, C, L) channel-major blocks,
    with no narrow-minor-dim transpose (see fused_cp._axis_blocks). Total
    size N·S must be a multiple of `lanes`."""
    x = jnp.stack([c.reshape(-1) for c in comps], axis=0)  # (C, T)
    c, t = x.shape
    assert t % lanes == 0
    return x.astype(jnp.float32).reshape(c, t // lanes, lanes).transpose(
        1, 0, 2)


def fused_t_rays_eval(field, params, rays_o, rays_d, view_dirs, z_vals,
                      sigma_only: bool = False, interpret: bool = None,
                      sigma_act: str = "relu"):
    """Ray-mode adapter with in-kernel compositing.

    Returns a dict: weights (N, S) always; plus per-ray opacity (N,),
    rgb (N, 3), normal (N, 3), mirror (N,), depth (N,) unless sigma_only.
    Rays are padded to whole blocks; L must be a multiple of S.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, s = z_vals.shape
    import os

    lanes = int(os.environ.get("MNERF_T_LANES", LANES))
    if lanes % s != 0:
        lanes = s * max(1, lanes // s)
    spec = TSpec(n_emb_xyz=field.N_emb_xyz, n_emb_dir=field.N_emb_dir,
                 samples=s, sigma_only=sigma_only,
                 predict_normal=field.predict_normal,
                 predict_mirror_mask=field.predict_mirror_mask,
                 lanes=lanes,
                 dtype="float32" if interpret else "bfloat16",
                 sigma_act=sigma_act)
    rpb = spec.rays_per_block
    n_pad = (n + rpb - 1) // rpb * rpb
    pad = ((0, n_pad - n), (0, 0))
    o = jnp.pad(rays_o.astype(jnp.float32), pad)
    d = jnp.pad(rays_d.astype(jnp.float32), pad)
    v = jnp.pad(view_dirs.astype(jnp.float32), pad)
    z = jnp.pad(z_vals.astype(jnp.float32), ((0, n_pad - n), (0, 0)),
                constant_values=1.0)
    deltas = jnp.concatenate(
        [z[:, 1:] - z[:, :-1], jnp.full_like(z[:, :1], 1e10)], axis=-1)
    x3 = _axis_blocks([o[:, a:a + 1] + d[:, a:a + 1] * z for a in range(3)],
                      lanes)
    d3 = (jnp.zeros_like(x3) if sigma_only else _axis_blocks(
        [jnp.broadcast_to(v[:, a:a + 1], (n_pad, s)) for a in range(3)],
        lanes))
    z_row = _axis_blocks([z], lanes)
    dl_row = _axis_blocks([deltas], lanes)
    packed = pack_t_params(params, spec, in_xyz=field.in_xyz,
                           in_dir=field.in_dir, dtype=spec.jdtype)
    per_ray, wts = fused_t_forward(packed, x3, d3, z_row, dl_row, spec,
                                   interpret=interpret)
    res = {"weights": wts.reshape(-1)[:n * s].reshape(n, s)}
    if not sigma_only:
        pr = per_ray.transpose(1, 0, 2).reshape(16, -1)[:, :n]  # (16, N)
        res.update(opacity=pr[0], rgb=pr[1:4].T, normal=pr[4:7].T,
                   mirror=pr[7], depth=pr[8])
    return res
