"""Staged training loop (the reference's Lightning system, the JAX way).

Capability parity with reference `train.py` (NeRFSystem + Trainer):
  * geometry stage → reflection stage flip at `train_geometry_stage_end_epoch`,
    with the dataset switching from mask-only frames to all frames
    (reference train.py:386-403, datasets/blender.py:180-189)
  * per-epoch loss schedule (losses.py:221-255) and the RGB-in-mirror
    blackout during the geometry stage (train.py:410-416)
  * step skipping for batches lacking GT masks in early epochs
    (train.py:405-408) — here a loss×0 gate, same gradients
  * Adam + MultiStepLR via optax, per-epoch val render with PSNR

TPU-first structure: epoch-dependent *static* switches (stage, schedule,
fine-pass mode) key a small cache of jitted step functions; everything
data-dependent stays inside the jit. The ray batch is sharded over the
`data` mesh axis; params/optimizer state are replicated, and XLA inserts the
gradient all-reduce over ICI.
"""

from __future__ import annotations

import functools
import json
import os
import time
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.mathutil import psnr as psnr_fn
from ..models.fields import make_field
from ..parallel.mesh import (batch_sharding, block_sharding, get_mesh,
                             replicated)
from ..render.renderer import RenderSettings
from ..render.tracer import TraceSettings, trace_rays
from .checkpoints import load_train_ckpt, save_train_ckpt
from .losses import make_loss_settings, total_loss
from .optim import make_optimizer


def resolve_fine_pass(cfg, epoch: int) -> str:
    """only_one_field / N_importance semantics (reference rendering.py:309-360)."""
    if cfg.N_importance <= 0:
        return "none"
    if cfg.only_one_field:
        return "coarse" if epoch > cfg.only_one_field_fine_epoch else "none"
    return "fine"


def make_trace_settings(cfg, epoch: int, geometry_stage: bool,
                        is_eval: bool, test_time: bool = False) -> TraceSettings:
    import jax as _jax

    fused_density = (
        cfg.fused_train == "on"
        or (cfg.fused_train == "auto" and not is_eval
            and cfg.model_type == "nerf_tpu"
            and _jax.default_backend() == "tpu"))
    rs = RenderSettings(
        N_samples=cfg.N_samples,
        N_importance=cfg.N_importance,
        use_disp=cfg.use_disp,
        perturb=0.0 if cfg.for_vis else cfg.perturb,
        noise_std=0.0 if cfg.for_vis else cfg.noise_std,
        white_back=False,
        test_time=test_time,
        compute_normal=cfg.trace_secondary_rays,
        fine_pass=resolve_fine_pass(cfg, epoch),
        detach_density_outside_mirror_for_mask_loss=(
            cfg.detach_density_outside_mirror_for_mask_loss),
        detach_density_for_mask_loss=cfg.detach_density_for_mask_loss,
        detach_density_for_normal_loss=cfg.detach_density_for_normal_loss,
        fused_density=fused_density,
        fp32_sigma_grad=cfg.fp32_sigma_grad,
        proposal_skip=getattr(cfg, "train_proposal_skip", False),
        sigma_activation=getattr(cfg, "sigma_activation", "relu"),
    )
    return TraceSettings(
        render=rs,
        trace_secondary_rays=cfg.trace_secondary_rays and not geometry_stage,
        max_recursive_level=cfg.max_recursive_level,
        only_trace_mode="eval" if test_time else "train",
        only_trace_rays_in_mirrors=cfg.only_trace_rays_in_mirrors,
        detach_normal_in_reflection=cfg.detach_normal_in_reflection,
        detach_ref_color_for_blend=(
            cfg.detach_ref_color_for_blend
            and epoch >= cfg.train_geometry_stage_end_epoch + 1),
        is_eval=is_eval,
        compact_frac=(cfg.compact_frac if cfg.only_trace_rays_in_mirrors
                      else 1.0),
    )


def check_compaction_overflow(aux: dict, compact_frac: float,
                              tol: float = 0.01) -> None:
    """Hard-fail when secondary-ray compaction silently dropped >tol of the
    batch's mirror rays (the measured 7.6 dB training collapse, STATUS.md
    r2). `aux` carries the step's summed drop/mirror counters."""
    n_drop = aux.get("compact_dropped", 0.0)
    n_mirror = aux.get("compact_mirror", 0.0)
    if n_drop > tol * max(n_mirror, 1.0):
        raise RuntimeError(
            f"secondary-ray compaction overflow: {n_drop:.0f} of "
            f"{n_mirror:.0f} mirror rays dropped this step "
            f"(compact_frac={compact_frac}). Training with dropped "
            f"reflections silently collapses quality (measured: 7.6 dB, "
            f"STATUS.md r2) — raise --compact_frac (1.0 disables "
            f"compaction) or use a scene with a smaller mirror fraction.")


@dataclass
class EpochStatics:
    """The static switches that key one compiled train step."""

    geometry_stage: bool
    fine_pass: str
    enable_mask_loss: bool
    enable_plane_loss: bool
    enable_normal_losses: bool
    detach_ref_blend: bool
    gate_invalid_mask_steps: bool
    enable_novel_reg: bool = False

    @classmethod
    def of(cls, cfg, epoch: int, geometry_stage: bool):
        return cls(
            geometry_stage=geometry_stage,
            fine_pass=resolve_fine_pass(cfg, epoch),
            enable_mask_loss=(not geometry_stage)
            or epoch >= cfg.train_mirror_mask_start_epoch,
            enable_plane_loss=epoch >= cfg.smooth_mirror_start_epoch,
            enable_normal_losses=(not geometry_stage)
            or epoch >= cfg.train_normal_start_epoch,
            detach_ref_blend=epoch >= cfg.train_geometry_stage_end_epoch + 1,
            gate_invalid_mask_steps=epoch <= cfg.train_mirror_mask_start_epoch,
            enable_novel_reg=(cfg.novel_ray_batch > 0
                              and epoch >= cfg.novel_ray_start_epoch),
        )

    def key(self):
        return (self.geometry_stage, self.fine_pass, self.enable_mask_loss,
                self.enable_plane_loss, self.enable_normal_losses,
                self.detach_ref_blend, self.gate_invalid_mask_steps,
                self.enable_novel_reg)


class Trainer:
    """Host-side orchestration: data shuffling, stage flips, step dispatch."""

    def __init__(self, cfg, dataset, workdir: str, mesh=None,
                 val_dataset=None):
        self.cfg = cfg
        self.dataset = dataset
        self.val_dataset = val_dataset
        self.workdir = workdir
        os.makedirs(workdir, exist_ok=True)
        self.mesh = mesh if mesh is not None else get_mesh()
        self.n_dev = len(self.mesh.devices.reshape(-1))
        if cfg.batch_size % self.n_dev:
            raise ValueError(
                f"batch_size {cfg.batch_size} not divisible by "
                f"{self.n_dev} devices")

        self.field = make_field(cfg)
        key = jax.random.PRNGKey(cfg.seed)
        kc, kf, self.base_key = jax.random.split(key, 3)
        params = {"coarse": self.field.init(kc)}
        if cfg.N_importance > 0 and not cfg.only_one_field:
            params["fine"] = self.field.init(kf)

        n_rays = len(dataset.all_rays) if hasattr(dataset, "all_rays") else len(
            dataset)
        self.steps_per_epoch = max(n_rays // cfg.batch_size, 1)
        if getattr(cfg, "ref_steps_per_epoch", 0):
            # resolution-invariant schedules: rescale epoch-indexed knobs
            # to this dataset's steps-per-epoch (config.rescale_schedule)
            from ..config import rescale_schedule

            cfg = rescale_schedule(cfg, self.steps_per_epoch)
            self.cfg = cfg
            print(f"[trainer] ref_steps_per_epoch="
                  f"{cfg.ref_steps_per_epoch} -> schedule rescaled for "
                  f"{self.steps_per_epoch} steps/epoch: num_epochs="
                  f"{cfg.num_epochs}, decay_step={cfg.decay_step}, "
                  f"geometry_end={cfg.train_geometry_stage_end_epoch}",
                  flush=True)
        from .optim import make_lr_schedule

        self.lr_schedule = make_lr_schedule(cfg, self.steps_per_epoch)
        self.tx = make_optimizer(cfg, self.steps_per_epoch)
        opt_state = self.tx.init(params)

        rep = replicated(self.mesh)
        self.params = jax.device_put(params, rep)
        self.opt_state = jax.device_put(opt_state, rep)
        self.global_step = 0
        self.start_epoch = 0
        self.train_geometry_stage = cfg.train_geometry_stage

        if cfg.ckpt_path:
            self.params, self.opt_state, self.global_step, self.start_epoch = (
                load_train_ckpt(cfg.ckpt_path, params, opt_state))
            self.params = jax.device_put(self.params, rep)
            self.opt_state = jax.device_put(self.opt_state, rep)
        elif cfg.weight_path:
            # non-strict, prefix-filtered (reference utils/__init__.py:126-136)
            from .checkpoints import load_pytree_nonstrict

            self.params = jax.device_put(
                load_pytree_nonstrict(
                    cfg.weight_path, params,
                    prefixes_to_ignore=cfg.prefixes_to_ignore), rep)

        self._step_cache = {}
        self._keystack_cache = {}
        self._metrics_path = os.path.join(workdir, "metrics.jsonl")

    # ---- compiled step construction ----

    def _build_step_fn(self, statics: EpochStatics):
        """The raw (unjitted) train step for one epoch-statics combination.

        Pure function of (params, opt_state, batch, rng) — reused verbatim by
        the single-step jit (`_build_step`) and the K-steps-per-dispatch scan
        (`_build_multi_step`), so the two paths compute identical math.
        """
        cfg = self.cfg
        field = self.field
        tx = self.tx
        # epoch passed only through statics-resolved settings; use a
        # representative epoch for the settings constructors
        epoch = 10**6 if not statics.geometry_stage else 0

        from dataclasses import replace as dc_replace

        ts = make_trace_settings(cfg, epoch, statics.geometry_stage,
                                 is_eval=False)
        ts = dc_replace(
            ts,
            render=dc_replace(ts.render, fine_pass=statics.fine_pass),
            detach_ref_color_for_blend=(
                cfg.detach_ref_color_for_blend and statics.detach_ref_blend),
        )
        ls = make_loss_settings(cfg, statics.geometry_stage, epoch)
        ls = dc_replace(
            ls,
            enable_mask_loss=statics.enable_mask_loss,
            enable_plane_loss=statics.enable_plane_loss,
            enable_normal_losses=statics.enable_normal_losses,
        )

        def step_fn(params, opt_state, batch, rng):
            rays = batch["rays"]
            rgbs = batch["rgbs"]
            mask = batch["mirror_mask"]
            k_trace, k_loss = jax.random.split(rng)

            mask_all_valid = jnp.all(mask >= 0)
            if statics.geometry_stage and not cfg.woMaskRGBtoBlack:
                # black out GT color inside the mirror (train.py:410-416)
                blackout = mask_all_valid
                rgbs = jnp.where(
                    blackout & (mask > 0.5)[:, None], 0.0, rgbs)
            batch_in = {**batch, "rgbs": rgbs}

            def _render(p, rays_, mask_, key_):
                return trace_rays(field, p, rays_, mask_, key_, ts)

            render = (jax.checkpoint(_render) if cfg.use_remat else _render)

            def loss_fn(p):
                results = render(p, rays, mask, k_trace)
                loss, loss_dict = total_loss(ls, results, batch_in, k_loss)
                if statics.enable_novel_reg:
                    from .losses import novel_ray_regularization

                    k_novel = jax.random.fold_in(k_loss, 7)
                    nv = cfg.novel_ray_loss_weight * novel_ray_regularization(
                        field, p, rays[:cfg.novel_ray_batch], k_novel,
                        cfg.N_samples, cfg.novel_pose_jitter,
                        fused=ts.render.fused_density,
                        sigma_act=ts.render.sigma_activation)
                    loss = loss + nv
                    loss_dict["novel_ray_reg"] = nv
                if cfg.cp_tv_loss_weight > 0 and cfg.model_type == "nerf_tpu":
                    from ..ops.cpgrid import cpgrid_tv_loss

                    tv = sum(cpgrid_tv_loss(p[m]["grid"]) for m in p)
                    tv = cfg.cp_tv_loss_weight * tv
                    loss = loss + tv
                    loss_dict["cp_tv"] = tv
                if statics.gate_invalid_mask_steps:
                    # skip steps whose batch lacks GT masks in early epochs
                    # (train.py:405-408): gate the loss to zero
                    loss = jnp.where(mask_all_valid, loss, 0.0)
                typ = "fine" if f"rgb_fine" in results else "coarse"
                aux = {
                    "psnr": psnr_fn(results[f"rgb_{typ}"], rgbs),
                    **{k: v for k, v in loss_dict.items()},
                }
                if "rgb_coarse" in results:  # absent under proposal_skip
                    aux["psnr_coarse"] = psnr_fn(results["rgb_coarse"], rgbs)
                if "compact_dropped" in results:
                    # secondary-ray compaction overflow guard (the measured
                    # 7.6 dB footgun, STATUS.md r2) — checked host-side at
                    # every log step, hard-fails above 1% overflow
                    aux["compact_dropped"] = jnp.sum(
                        results["compact_dropped"])
                    aux["compact_mirror"] = jnp.sum(
                        (results["mirror_mask_resolved"] > 0.5)
                        .astype(jnp.float32))
                return loss, aux

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, new_opt = tx.update(grads, opt_state, params)
            new_params = jax.tree_util.tree_map(
                lambda p, u: p + u, params, updates)
            aux["loss"] = loss
            return new_params, new_opt, aux

        return step_fn

    def _build_step(self, statics: EpochStatics):
        step_fn = self._build_step_fn(statics)
        rep = replicated(self.mesh)
        bsh = batch_sharding(self.mesh)
        return jax.jit(
            step_fn,
            in_shardings=(rep, rep, {"rays": bsh, "rgbs": bsh,
                                     "mirror_mask": bsh}, rep),
            out_shardings=(rep, rep, rep),
            donate_argnums=(0, 1),
        )

    def _build_multi_step(self, statics: EpochStatics, k: int):
        """K sequential train steps in ONE dispatch via lax.scan.

        The scan body is exactly `_build_step_fn`'s step, so K scanned steps
        compute the same params/opt trajectory as K single-step dispatches
        with the same batches and rng keys; only the per-dispatch tunnel
        latency (~30-40 ms on this attachment, BASELINE.md) amortizes.
        Returns the LAST step's aux (the loop logs every `log_every` steps,
        which stays a multiple of k).
        """
        step_fn = self._build_step_fn(statics)

        def multi_fn(params, opt_state, batches_k, keys_k):
            def body(carry, xt):
                p, o = carry
                batch, key = xt
                p, o, aux = step_fn(p, o, batch, key)
                return (p, o), aux

            (params, opt_state), auxes = jax.lax.scan(
                body, (params, opt_state), (batches_k, keys_k))
            last = jax.tree_util.tree_map(lambda a: a[-1], auxes)
            return params, opt_state, last

        rep = replicated(self.mesh)
        blk = block_sharding(self.mesh)
        return jax.jit(
            multi_fn,
            in_shardings=(rep, rep, {"rays": blk, "rgbs": blk,
                                     "mirror_mask": blk}, rep),
            out_shardings=(rep, rep, rep),
            donate_argnums=(0, 1),
        )

    def _key_stack_fn(self, k: int):
        """Jitted (base_key, step0) -> (k, 2) stack of
        fold_in(base_key, step0 + j) keys; bitwise-identical to the eager
        per-key loop it replaces, in ONE device dispatch instead of k+1."""
        fn = self._keystack_cache.get(k)
        if fn is None:
            def build(base, s0):
                return jax.vmap(
                    lambda j: jax.random.fold_in(base, s0 + j)
                )(jnp.arange(k, dtype=jnp.int32))

            fn = jax.jit(build)
            self._keystack_cache[k] = fn
        return fn

    def get_multi_step_fn(self, statics: EpochStatics, k: int):
        ck = statics.key() + ("multi", k)
        if ck not in self._step_cache:
            self._step_cache[ck] = self._build_multi_step(statics, k)
        return self._step_cache[ck]

    def get_step_fn(self, statics: EpochStatics):
        k = statics.key()
        if k not in self._step_cache:
            self._step_cache[k] = self._build_step(statics)
        return self._step_cache[k]

    # ---- epochs ----

    def stage_for_epoch(self, epoch: int) -> bool:
        return (self.cfg.train_geometry_stage
                and epoch < self.cfg.train_geometry_stage_end_epoch)

    def run_epoch(self, epoch: int, np_rng: np.random.Generator,
                  log_every: int = 50) -> dict:
        cfg = self.cfg
        geometry_stage = self.stage_for_epoch(epoch)
        self.train_geometry_stage = geometry_stage
        if hasattr(self.dataset, "train_geometry_stage"):
            self.dataset.train_geometry_stage = geometry_stage
        rays, rgbs, masks = self.dataset.train_buffers()

        statics = EpochStatics.of(cfg, epoch, geometry_stage)
        bsh = batch_sharding(self.mesh)
        blk = block_sharding(self.mesh)

        from ..native import gather_batch

        n = len(rays)
        perm = np_rng.permutation(n)
        n_steps = n // cfg.batch_size

        # steps per dispatch (lax.scan over K sequential optimizer steps in
        # one jit — same trajectory, K× fewer dispatches; see
        # _build_multi_step). 0 = auto: 8 on TPU, 1 elsewhere.
        k_disp = int(cfg.steps_per_dispatch)
        if k_disp <= 0:
            k_disp = 8 if jax.default_backend() == "tpu" else 1
        k_disp = max(min(k_disp, n_steps), 1)
        step_fn = (self.get_step_fn(statics) if k_disp == 1
                   else self.get_multi_step_fn(statics, k_disp))

        # per-phase wall accumulators (host gather / host->device transfer /
        # dispatch enqueue / sync fetches) — the reconciliation data for the
        # microbench-vs-epoch-wall gap (VERDICT r4 #4); logged per epoch
        timers = {"gather_s": 0.0, "put_s": 0.0, "call_s": 0.0, "sync_s": 0.0}
        self._epoch_timers = timers

        def dispatch(s0: int, k: int, fn):
            """Run steps s0..s0+k-1 (epoch-step indices) in one call."""
            idx = perm[s0 * cfg.batch_size:(s0 + k) * cfg.batch_size]
            tg = time.time()
            b_rays, b_rgbs, b_masks = gather_batch(rays, rgbs, masks, idx)
            timers["gather_s"] += time.time() - tg
            tp = time.time()
            if k == 1:
                batch = {
                    "rays": jax.device_put(b_rays, bsh),
                    "rgbs": jax.device_put(b_rgbs, bsh),
                    "mirror_mask": jax.device_put(b_masks, bsh),
                }
                rng = jax.random.fold_in(self.base_key, self.global_step)
            else:
                batch = {
                    "rays": jax.device_put(
                        b_rays.reshape(k, cfg.batch_size, -1), blk),
                    "rgbs": jax.device_put(
                        b_rgbs.reshape(k, cfg.batch_size, -1), blk),
                    "mirror_mask": jax.device_put(
                        b_masks.reshape(k, cfg.batch_size), blk),
                }
                # one jitted call builds all K fold_in keys on device —
                # the eager per-key version was K+1 dispatches (tunnel
                # round-trips) per K-step dispatch (measured host overhead,
                # BASELINE.md round 4). Bitwise-identical keys.
                rng = self._key_stack_fn(k)(
                    self.base_key, jnp.int32(self.global_step))
            timers["put_s"] += time.time() - tp
            tc = time.time()
            self.params, self.opt_state, aux = fn(
                self.params, self.opt_state, batch, rng)
            timers["call_s"] += time.time() - tc
            self.global_step += k
            return aux

        last_aux = {}
        t0, t_skip = time.time(), 0
        s = 0
        first = True
        pending = None  # (device aux, global_step at enqueue): lag-1 logging

        def flush(p):
            """Fetch + log a PREVIOUS log-point's aux. By the next log point
            it has long finished on device, so the fetch returns without
            draining the dispatch queue — the mid-epoch pipeline stalls that
            capped the round-4 wall rate at 80k (BASELINE.md round-5
            reconciliation: 85 s of a 91 s epoch window blocked in these
            fetches) are gone. The final aux is still fetched synchronously
            after the loop, so rays_per_sec keeps covering all device work.
            """
            nonlocal last_aux
            p_aux, p_step = p
            ts = time.time()
            last_aux = {k: float(v) for k, v in p_aux.items()}
            timers["sync_s"] += time.time() - ts
            check_compaction_overflow(last_aux, cfg.compact_frac)
            last_aux["lr"] = float(self.lr_schedule(p_step))
            self._log({"epoch": epoch, "step": p_step,
                       "stage": "geometry" if geometry_stage else "full",
                       **last_aux})

        while s < n_steps:
            prev_s = s
            if k_disp > 1 and s + k_disp <= n_steps:
                aux = dispatch(s, k_disp, step_fn)
                s += k_disp
            elif k_disp > 1:
                # tail: r (< k_disp) steps in one shorter scan — same body,
                # memoized per length, so at most one extra compile per stage
                r = n_steps - s
                aux = dispatch(s, r, self.get_multi_step_fn(statics, r)
                               if r > 1 else self.get_step_fn(statics))
                s = n_steps
            else:
                aux = dispatch(s, 1, step_fn)
                s += 1
            if first:
                # the first step of a new stage compiles (minutes on TPU);
                # restart the throughput clock so rays_per_sec reports
                # steady-state stepping, not compile time (fetch a value:
                # on this attachment only fetches synchronize)
                float(aux["loss"])
                t0, t_skip = time.time(), s
                first = False
            if prev_s // max(log_every, 1) != s // max(log_every, 1) \
                    or s >= n_steps:
                if pending is not None:
                    flush(pending)
                pending = (aux, self.global_step)
        if pending is not None:
            flush(pending)  # the final aux: this fetch drains the queue
        dt = time.time() - t0
        last_aux["rays_per_sec"] = (max(n_steps - t_skip, 1) * cfg.batch_size
                                    / max(dt, 1e-9))
        last_aux["epoch_wall_s"] = dt
        for tk, tv in timers.items():
            last_aux[f"t_{tk}"] = round(tv, 3)
        return last_aux

    def fit(self, on_epoch_end=None):
        np_rng = np.random.default_rng(self.cfg.seed)
        final = {}
        for epoch in range(self.start_epoch, self.cfg.num_epochs):
            final = self.run_epoch(epoch, np_rng)
            ckpt = os.path.join(self.workdir, "last.ckpt.npz")
            save_train_ckpt(ckpt, jax.device_get(self.params),
                            jax.device_get(self.opt_state),
                            self.global_step, epoch + 1)
            save_train_ckpt(
                os.path.join(self.workdir, f"epoch={epoch}.ckpt.npz"),
                jax.device_get(self.params), jax.device_get(self.opt_state),
                self.global_step, epoch + 1)
            if on_epoch_end is not None:
                on_epoch_end(self, epoch, final)
        return final

    def _log(self, record: dict):
        with open(self._metrics_path, "a") as f:
            f.write(json.dumps(record) + "\n")


# ---- full-image rendering (val/eval) --------------------------------------

# jitted render fns keyed by (field, output keys[, "k"]) — see
# render_image_chunked
_RENDER_JIT_CACHE: dict = {}
# working chunk size per (field, ts, mesh size, megabatch): failed compiles
# (libtpu regalloc RET_CHECKs at large chunks) are not cached by jax, so
# re-probing would re-pay the failed compile on every call
_GOOD_CHUNK: dict = {}


def render_image_chunked(field, params, rays: np.ndarray,
                         mirror_mask: Optional[np.ndarray],
                         rng, ts: TraceSettings, chunk: int,
                         keys=("rgb_fine", "rgb_coarse", "depth_fine",
                               "depth_coarse", "mirror_mask_resolved"),
                         mesh=None, megabatch: int = 0) -> dict:
    """Render an arbitrary number of rays through fixed-size jitted chunks.

    Pads the tail chunk so only ONE program is compiled per settings
    (replaces the reference's torch chunk loops, train.py:102-127). With a
    `mesh`, each chunk's rays are sharded over the data axis — SPMD eval,
    the TPU analog of the reference's DDP eval replicas.

    megabatch > 1 renders K chunks per dispatch via lax.map (scan body ==
    the single-chunk program) to amortize per-dispatch tunnel latency;
    0 = auto (4 on TPU, 1 elsewhere). Per-chunk math and PRNG keys are
    identical to K=1, so outputs are bit-identical.
    """
    n = rays.shape[0]
    if mirror_mask is None:
        mirror_mask = np.full((n,), -1.0, np.float32)

    if mesh is not None:
        # every chunk is sharded over the data axis: its length must be a
        # multiple of the device count
        nd = mesh.devices.size
        chunk = max((chunk + nd - 1) // nd * nd, nd)

    meg = int(megabatch)
    if meg <= 0:
        meg = 4 if jax.default_backend() == "tpu" else 1
    meg = max(min(meg, (n + chunk - 1) // chunk), 1)

    gc_key = (field, ts, mesh.devices.size if mesh is not None else 0, meg)
    chunk = min(_GOOD_CHUNK.get(gc_key, chunk), chunk)

    put = (lambda x: jax.device_put(x, batch_sharding(mesh))) if mesh is not None \
        else jnp.asarray
    put_blocks = (lambda x: jax.device_put(x, block_sharding(mesh))) \
        if mesh is not None else jnp.asarray

    # jit wrappers are memoized per (field, keys): a fresh jax.jit each call
    # would retrace (and re-pay any failed-compile probe) on every epoch's
    # val render. Fields are frozen dataclasses — hashable cache keys.
    jit_key = (field, tuple(keys))
    traced = _RENDER_JIT_CACHE.get(jit_key)
    if traced is None:
        traced = jax.jit(
            functools.partial(trace_rays, field),
            static_argnames=("ts",),
        )
        _RENDER_JIT_CACHE[jit_key] = traced

    def _pad_chunk(start):
        end = min(start + chunk, n)
        pad = chunk - (end - start)
        # pad by repeating the last row: always yields exactly `chunk` rows
        # (a mirrored slice underfills whenever the remainder < pad)
        r, m = rays[start:end], mirror_mask[start:end]
        if pad:
            r = np.concatenate([r, np.repeat(r[-1:], pad, axis=0)])
            m = np.concatenate([m, np.repeat(m[-1:], pad, axis=0)])
        return r, m

    if meg > 1:
        jit_k = _RENDER_JIT_CACHE.get(jit_key + ("k",))
        if jit_k is None:
            def traced_k(params, rays_k, mask_k, keys_k, ts):
                def body(t):
                    res = trace_rays(field, params, t[0], t[1], t[2], ts)
                    return {k: res[k] for k in keys if k in res}

                return jax.lax.map(body, (rays_k, mask_k, keys_k))

            jit_k = jax.jit(traced_k, static_argnames=("ts",))
            _RENDER_JIT_CACHE[jit_key + ("k",)] = jit_k
        pend = []
        try:
            for g in range(0, n, chunk * meg):
                rs_, ms_, ks_ = [], [], []
                for j in range(meg):
                    s = min(g + j * chunk, max(n - 1, 0))
                    r, m = _pad_chunk(s)
                    rs_.append(r)
                    ms_.append(m)
                    ks_.append(jax.random.fold_in(rng, min(g + j * chunk, n)))
                res = jit_k(params, put_blocks(np.stack(rs_)),
                            put_blocks(np.stack(ms_)), jnp.stack(ks_), ts=ts)
                pend.append((g, res))
        except Exception as e:  # noqa: BLE001
            if chunk > 256 and "INTERNAL" in str(e):
                print(f"[warn] render compile failed at chunk={chunk}; "
                      f"retrying with {chunk // 2}")
                return render_image_chunked(
                    field, params, rays, mirror_mask, rng, ts, chunk // 2,
                    keys, mesh, megabatch)
            raise
        _GOOD_CHUNK[gc_key] = chunk
        outs = {}
        for g, res in pend:
            valid = min(chunk * meg, n - g)
            for k, v in res.items():
                v = np.asarray(v).reshape((-1,) + v.shape[2:])
                outs.setdefault(k, []).append(v[:valid])
        return {k: np.concatenate(v, 0) for k, v in outs.items()}

    outs = {}
    for start in range(0, n, chunk):
        end = min(start + chunk, n)
        r, m = _pad_chunk(start)
        try:
            res = traced(params, put(r), put(m),
                         jax.random.fold_in(rng, start), ts=ts)
        except Exception as e:  # noqa: BLE001
            # Very large σ-gradient render graphs can trip internal libtpu
            # compiler bugs (register-allocation RET_CHECKs). Halve the
            # chunk and retry — smaller programs compile fine.
            if start == 0 and chunk > 256 and "INTERNAL" in str(e):
                print(f"[warn] render compile failed at chunk={chunk}; "
                      f"retrying with {chunk // 2}")
                return render_image_chunked(
                    field, params, rays, mirror_mask, rng, ts, chunk // 2,
                    keys, mesh)
            raise
        _GOOD_CHUNK[gc_key] = chunk
        for k in keys:
            if k in res:
                v = np.asarray(res[k])
                outs.setdefault(k, []).append(v[:end - start])
    return {k: np.concatenate(v, 0) for k, v in outs.items()}
