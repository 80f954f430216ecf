"""Typed config + CLI flag registry.

Mirrors the public flag surface of the reference (`/root/reference/opt.py:4-248`)
so that `run.sh`-style invocations work unchanged, but stores everything in a
frozen (hashable) dataclass so configs can be closed over by jitted functions
as static data.
"""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass
from typing import Optional, Tuple


@dataclass(frozen=True)
class Config:
    # data
    root_dir: str = ""
    dataset_name: str = "blender"  # blender | llff | real_colmap | real_arkit
    img_wh: Tuple[int, int] = (800, 800)
    spheric_poses: bool = False

    # encodings / sampling
    N_emb_xyz: int = 10
    N_emb_dir: int = 4
    N_samples: int = 64
    N_importance: int = 128
    use_disp: bool = False
    perturb: float = 1.0
    noise_std: float = 1.0

    # exec
    batch_size: int = 1024
    chunk: int = 32 * 1024
    num_epochs: int = 16
    num_gpus: int = 1  # kept for CLI parity; maps to number of mesh devices

    # checkpoints
    ckpt_path: Optional[str] = None
    prefixes_to_ignore: Tuple[str, ...] = ("loss",)
    weight_path: Optional[str] = None

    # optim
    optimizer: str = "adam"  # sgd | adam | radam | ranger
    lr: float = 5e-4
    momentum: float = 0.9
    weight_decay: float = 0.0
    # Adam epsilon: the reference sticks with torch's 1e-8 for the MLP
    # flagship; grid-table models (NGP/TensoRF lineage) train with a much
    # smaller eps (1e-15) so near-zero second moments don't freeze table
    # entries — exposed for the nerf_tpu quality recipe.
    adam_eps: float = 1e-8
    # Per-group lr: multiplier applied to updates of the encoder grid
    # subtree (params[*]["grid"]). TensoRF trains grids at ~20-40x the MLP
    # lr (0.02 vs 1e-3); the reference gets the same effect from tcnn's
    # internal scaling. 1.0 = off (exact legacy trajectory).
    grid_lr_mult: float = 1.0
    # COARSE-field grid lr multiplier (None = same as grid_lr_mult). At
    # grid_lr_mult 20 the coarse proposal field diverges while the fine
    # field thrives (BASELINE.md round 4); a tamer coarse grid keeps the
    # proposal live.
    coarse_grid_lr_mult: float = None
    # TPU-first single-pass training: skip the coarse proposal pass and
    # train ONE fine pass on N_samples+N_importance stratified samples per
    # ray. Measured rationale (BASELINE.md round 4): for the CP-grid model
    # the trained proposal is dead weight — eval with --proposal_skip is
    # +0.7 dB AND 1.49x. Cuts ~1/3 of train sample FLOPs; coarse losses
    # vanish by key absence. Off by default (reference trajectory).
    train_proposal_skip: bool = False
    lr_scheduler: str = "steplr"  # steplr | cosine | poly
    warmup_multiplier: float = 1.0
    warmup_epochs: int = 0
    decay_step: Tuple[int, ...] = (20,)
    decay_gamma: float = 0.1
    poly_exp: float = 0.9

    exp_name: str = "exp"

    # model
    # nerf | nerf_tcnn (ngp-style hash grid) | nerf_tpu (CP-grid speed model)
    model_type: str = "nerf"
    predict_normal: bool = False
    predict_mirror_mask: bool = False
    trace_secondary_rays: bool = False
    only_one_field: bool = False
    only_one_field_fine_epoch: int = 2

    # dataset geometry
    log2_hashmap_size: int = 19  # hash-grid table size (nerf_tcnn path)
    # CP-grid scales for the nerf_tpu speed model: "res:rank,res:rank,..."
    # (speed/quality knob; encoder FLOPs scale with sum(res*rank))
    grid_levels: str = "64:64,256:64,512:64"
    bound: float = 1.0
    near: float = 0.05
    far: float = 8.0
    scale_factor: float = 1.0
    val_idx: int = 0
    train_skip_step: int = 1

    # training strategy
    max_recursive_level: int = 1
    only_trace_rays_in_mirrors: bool = False
    for_vis: bool = False
    debug: bool = False
    train_geometry_stage: bool = False
    train_geometry_stage_end_epoch: int = 4
    smooth_mirror_start_epoch: int = 2
    train_mirror_mask_start_epoch: int = 2
    train_normal_start_epoch: int = 1

    # detach (stop-gradient) controls
    detach_density_outside_mirror_for_mask_loss: bool = False
    detach_density_for_mask_loss: bool = False
    detach_density_for_normal_loss: bool = False
    detach_normal_in_reflection: bool = False
    woMaskRGBtoBlack: bool = False
    detach_ref_color_for_blend: bool = False

    # loss switches
    normal_loss_only_inside_mirror: bool = False
    use_plane_consistent_loss: bool = False

    # loss weights
    color_loss_weight: float = 1.0
    normal_loss_weight: float = 1e-4
    normal_reg_loss_weight: float = 0.1
    mirror_mask_loss_weight: float = 0.1
    plane_consistent_loss_weight: float = 0.1
    # TPU extra (not in reference opt.py): mip-NeRF 360 distortion prior on
    # the fine weights; suppresses fog floaters on sparse captures. 0 = off.
    distortion_loss_weight: float = 0.0
    # TPU extra: novel-ray regularization. Each step casts `novel_ray_batch`
    # extra rays whose ORIGINS are jittered off the train cameras (by
    # `novel_pose_jitter` world units) and applies the distortion prior to
    # their σ-composited weights — no color target needed. Train-ray losses
    # cannot see floaters parked in space no train ray traverses
    # (STATUS.md item 7); these rays sweep exactly that space. 0 = off.
    novel_ray_batch: int = 0
    novel_pose_jitter: float = 0.15
    novel_ray_loss_weight: float = 1e-3
    novel_ray_start_epoch: int = 0
    # TPU extra: total-variation prior on the CP-grid 1-D factor tables
    # (nerf_tpu). The CP product of 1-D factors has global axis-aligned
    # support, so training poses constrain it only on their ray corridors;
    # TV on the tables smooths exactly the off-corridor structure (the
    # TensoRF regularizer; analog of the reference hash grid's TV op,
    # gridencoder.cu:584-752). 0 = off.
    cp_tv_loss_weight: float = 0.0

    # --- TPU-specific additions (not in the reference surface) ---
    # capacity fraction for secondary-ray compaction when
    # only_trace_rays_in_mirrors is set (1.0 = off: trace everything,
    # masked). Only exact while a batch's mirror-pixel count fits the
    # capacity — set below 1.0 only for scenes with small mirror fractions;
    # overflowing drops reflections from training and stalls the color loss
    compact_frac: float = 1.0
    # rematerialize the traced render in the backward pass (trades ~1 extra
    # forward for O(1) activation memory — enables larger train batches)
    use_remat: bool = False
    # training-side fused density+∇σ custom-VJP kernel for the CP-grid
    # model (ops/pallas/fused_cp_train.py): auto = on when training
    # nerf_tpu on TPU; exact to fp32 roundoff vs the XLA path incl.
    # grad-of-grad (tests/test_fused_cp_train.py)
    fused_train: str = "auto"  # auto | on | off
    # train steps per dispatch: lax.scan over K sequential optimizer steps
    # inside one jit call — identical math/trajectory to K single-step
    # dispatches (same batches, same per-step rng keys); only the
    # per-dispatch tunnel latency (~30-40 ms on remote attachments)
    # amortizes. 0 = auto (8 on TPU, 1 elsewhere)
    steps_per_dispatch: int = 0
    seed: int = 1
    mesh_shape: Tuple[int, ...] = ()  # () -> use all local devices on one axis
    param_dtype: str = "float32"
    compute_dtype: str = "float32"  # bfloat16 for the ngp path
    # With --compute_dtype bfloat16: keep the σ-gradient (analytic normal)
    # density pass in fp32. Probes whether bf16 training's measured ~2 dB
    # held-out loss (STATUS.md round 2) is quantized normal supervision.
    fp32_sigma_grad: bool = False
    # σ -> density nonlinearity ("relu" | "softplus"). "relu" is the
    # reference semantics (rendering.py:189-192); "softplus" has no
    # zero-gradient dead region — the principled fix for the ReLU-death
    # basin that freezes hot-lr CP-grid coarse proposals in epoch 0
    # (BASELINE.md round 4). Applies to training AND eval compositing
    # (unfused + fused kernels); a checkpoint must be eval'd with the
    # activation it trained with.
    sigma_activation: str = "relu"

    # Resolution-invariant scheduling (round 5): when > 0, every
    # epoch-indexed schedule knob (num_epochs, decay_step, warmup_epochs,
    # stage start/end epochs, novel_ray_start_epoch,
    # only_one_field_fine_epoch) is interpreted as if an epoch had this
    # many optimizer steps, and rescaled to the dataset's ACTUAL
    # steps-per-epoch at Trainer construction (`rescale_schedule`). Fixes
    # the measured failure mode where training the same scene at 400×300
    # (1.53× rays/epoch) stretched the effective step schedule 1.53× and
    # cost ~6 dB held-out (BASELINE.md round-5 paper-protocol diagnosis;
    # step-equivalent rerun recovered +5.7 dB).
    ref_steps_per_epoch: int = 0

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


_EPOCH_KNOBS = (
    "num_epochs", "warmup_epochs", "train_geometry_stage_end_epoch",
    "smooth_mirror_start_epoch", "train_mirror_mask_start_epoch",
    "train_normal_start_epoch", "novel_ray_start_epoch",
    "only_one_field_fine_epoch",
)


def rescale_schedule(cfg: "Config", steps_per_epoch: int) -> "Config":
    """Rescale epoch-indexed knobs so their STEP positions match a
    reference steps-per-epoch (`cfg.ref_steps_per_epoch`). No-op when the
    flag is unset or the dataset already matches the reference."""
    ref = int(cfg.ref_steps_per_epoch)
    if ref <= 0 or steps_per_epoch <= 0 or ref == steps_per_epoch:
        return cfg
    scale = ref / float(steps_per_epoch)
    kw = {}
    for knob in _EPOCH_KNOBS:
        v = getattr(cfg, knob)
        kw[knob] = max(int(round(v * scale)), 1) if knob == "num_epochs" \
            else int(round(v * scale))
    kw["decay_step"] = tuple(
        max(int(round(d * scale)), 1) for d in cfg.decay_step)
    return cfg.replace(**kw)


def add_common_args(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    d = Config()
    p = parser
    p.add_argument("--root_dir", type=str, default=d.root_dir)
    p.add_argument("--dataset_name", type=str, default=d.dataset_name,
                   choices=["blender", "llff", "real_colmap", "real_arkit"])
    p.add_argument("--img_wh", nargs="+", type=int, default=list(d.img_wh))
    p.add_argument("--spheric_poses", default=False, action="store_true")

    p.add_argument("--N_emb_xyz", type=int, default=d.N_emb_xyz)
    p.add_argument("--N_emb_dir", type=int, default=d.N_emb_dir)
    p.add_argument("--N_samples", type=int, default=d.N_samples)
    p.add_argument("--N_importance", type=int, default=d.N_importance)
    p.add_argument("--use_disp", default=False, action="store_true")
    p.add_argument("--perturb", type=float, default=d.perturb)
    p.add_argument("--noise_std", type=float, default=d.noise_std)

    p.add_argument("--batch_size", type=int, default=d.batch_size)
    p.add_argument("--chunk", type=int, default=d.chunk)
    p.add_argument("--num_epochs", type=int, default=d.num_epochs)
    p.add_argument("--num_gpus", type=int, default=d.num_gpus)

    p.add_argument("--ckpt_path", type=str, default=None)
    p.add_argument("--prefixes_to_ignore", nargs="+", type=str, default=["loss"])
    p.add_argument("--weight_path", type=str, default=None)

    p.add_argument("--optimizer", type=str, default=d.optimizer,
                   choices=["sgd", "adam", "radam", "ranger"])
    p.add_argument("--lr", type=float, default=d.lr)
    p.add_argument("--momentum", type=float, default=d.momentum)
    p.add_argument("--weight_decay", type=float, default=d.weight_decay)
    p.add_argument("--adam_eps", type=float, default=d.adam_eps)
    p.add_argument("--grid_lr_mult", type=float, default=d.grid_lr_mult)
    p.add_argument("--coarse_grid_lr_mult", type=float,
                   default=d.coarse_grid_lr_mult)
    p.add_argument("--train_proposal_skip", default=d.train_proposal_skip,
                   action="store_true")
    p.add_argument("--lr_scheduler", type=str, default=d.lr_scheduler,
                   choices=["steplr", "cosine", "poly"])
    p.add_argument("--warmup_multiplier", type=float, default=d.warmup_multiplier)
    p.add_argument("--warmup_epochs", type=int, default=d.warmup_epochs)
    p.add_argument("--decay_step", nargs="+", type=int, default=list(d.decay_step))
    p.add_argument("--decay_gamma", type=float, default=d.decay_gamma)
    p.add_argument("--poly_exp", type=float, default=d.poly_exp)

    p.add_argument("--exp_name", type=str, default=d.exp_name)

    p.add_argument("--model_type", type=str, default=d.model_type,
                   choices=["nerf", "nerf_tcnn", "nerf_tpu"])
    p.add_argument("--predict_normal", action="store_true", default=False)
    p.add_argument("--predict_mirror_mask", action="store_true", default=False)
    p.add_argument("--trace_secondary_rays", action="store_true", default=False)
    p.add_argument("--only_one_field", action="store_true", default=False)
    p.add_argument("--only_one_field_fine_epoch", type=int,
                   default=d.only_one_field_fine_epoch)

    p.add_argument("--log2_hashmap_size", type=int, default=d.log2_hashmap_size)
    p.add_argument("--grid_levels", type=str, default=d.grid_levels)
    p.add_argument("--bound", type=float, default=d.bound)
    p.add_argument("--near", type=float, default=d.near)
    p.add_argument("--far", type=float, default=d.far)
    p.add_argument("--scale_factor", type=float, default=d.scale_factor)
    p.add_argument("--val_idx", type=int, default=d.val_idx)
    p.add_argument("--train_skip_step", type=int, default=d.train_skip_step)

    p.add_argument("--max_recursive_level", type=int, default=d.max_recursive_level)
    p.add_argument("--only_trace_rays_in_mirrors", action="store_true", default=False)
    p.add_argument("--for_vis", action="store_true", default=False)
    p.add_argument("--debug", action="store_true", default=False)
    p.add_argument("--train_geometry_stage", action="store_true", default=False)
    p.add_argument("--train_geometry_stage_end_epoch", type=int,
                   default=d.train_geometry_stage_end_epoch)
    p.add_argument("--smooth_mirror_start_epoch", type=int,
                   default=d.smooth_mirror_start_epoch)
    p.add_argument("--train_mirror_mask_start_epoch", type=int,
                   default=d.train_mirror_mask_start_epoch)
    p.add_argument("--train_normal_start_epoch", type=int,
                   default=d.train_normal_start_epoch)

    p.add_argument("--detach_density_outside_mirror_for_mask_loss",
                   action="store_true", default=False)
    p.add_argument("--detach_density_for_mask_loss", action="store_true", default=False)
    p.add_argument("--detach_density_for_normal_loss", action="store_true", default=False)
    p.add_argument("--detach_normal_in_reflection", action="store_true", default=False)
    p.add_argument("--woMaskRGBtoBlack", action="store_true", default=False)
    p.add_argument("--detach_ref_color_for_blend", action="store_true", default=False)

    p.add_argument("--normal_loss_only_inside_mirror", action="store_true", default=False)
    p.add_argument("--use_plane_consistent_loss", action="store_true", default=False)

    p.add_argument("--color_loss_weight", type=float, default=d.color_loss_weight)
    p.add_argument("--normal_loss_weight", type=float, default=d.normal_loss_weight)
    p.add_argument("--normal_reg_loss_weight", type=float, default=d.normal_reg_loss_weight)
    p.add_argument("--mirror_mask_loss_weight", type=float, default=d.mirror_mask_loss_weight)
    p.add_argument("--plane_consistent_loss_weight", type=float,
                   default=d.plane_consistent_loss_weight)
    p.add_argument("--distortion_loss_weight", type=float,
                   default=d.distortion_loss_weight)
    p.add_argument("--novel_ray_batch", type=int, default=d.novel_ray_batch)
    p.add_argument("--novel_pose_jitter", type=float,
                   default=d.novel_pose_jitter)
    p.add_argument("--novel_ray_loss_weight", type=float,
                   default=d.novel_ray_loss_weight)
    p.add_argument("--novel_ray_start_epoch", type=int,
                   default=d.novel_ray_start_epoch)
    p.add_argument("--cp_tv_loss_weight", type=float,
                   default=d.cp_tv_loss_weight)

    # TPU-specific
    p.add_argument("--compact_frac", type=float, default=d.compact_frac)
    p.add_argument("--use_remat", action="store_true", default=False)
    p.add_argument("--fused_train", type=str, default=d.fused_train,
                   choices=["auto", "on", "off"])
    p.add_argument("--steps_per_dispatch", type=int,
                   default=d.steps_per_dispatch)
    p.add_argument("--seed", type=int, default=d.seed)
    p.add_argument("--param_dtype", type=str, default=d.param_dtype)
    p.add_argument("--compute_dtype", type=str, default=d.compute_dtype)
    p.add_argument("--fp32_sigma_grad", action="store_true",
                   default=d.fp32_sigma_grad)
    p.add_argument("--sigma_activation", type=str, default=d.sigma_activation,
                   choices=["relu", "softplus"])
    # interpret epoch-indexed schedule knobs at this steps-per-epoch and
    # rescale to the dataset's actual steps-per-epoch (resolution-invariant
    # recipes; 0 = off). E.g. the dense96 champion recipe is specified at
    # 7200 steps/epoch; pass --ref_steps_per_epoch 7200 when training the
    # same recipe at 400x300.
    p.add_argument("--ref_steps_per_epoch", type=int,
                   default=d.ref_steps_per_epoch)
    return p


def config_from_namespace(ns: argparse.Namespace) -> Config:
    known = {f.name for f in dataclasses.fields(Config)}
    kw = {}
    for k, v in vars(ns).items():
        if k not in known:
            continue
        if isinstance(v, list):
            v = tuple(v)
        kw[k] = v
    if "img_wh" in kw:
        kw["img_wh"] = tuple(int(x) for x in kw["img_wh"])
    return Config(**kw)


def get_opts(argv=None, parser: Optional[argparse.ArgumentParser] = None) -> Config:
    """Parse CLI flags into a Config (same flag names as reference opt.py)."""
    if parser is None:
        parser = argparse.ArgumentParser()
        add_common_args(parser)
    ns = parser.parse_args(argv)
    return config_from_namespace(ns)
