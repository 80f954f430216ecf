"""Optimizers and LR schedules (optax).

Capability parity with reference `utils/__init__.py:47-101` (sgd/adam/radam/
ranger; steplr/cosine/poly) and `utils/warmup_scheduler.py` (gradual warmup).
Schedules are *epoch-granular* like the torch versions — the step→epoch
mapping is baked in via `steps_per_epoch`, so the jitted update never sees
Python state.
"""

from __future__ import annotations

import optax


def make_lr_schedule(cfg, steps_per_epoch: int):
    """LR as a function of the global step."""
    base_lr = cfg.lr

    def epoch_of(step):
        return step // max(steps_per_epoch, 1)

    if cfg.lr_scheduler == "steplr":
        milestones = tuple(sorted(cfg.decay_step))

        def steplr(step):
            e = epoch_of(step)
            mult = 1.0
            for m in milestones:
                mult = mult * (cfg.decay_gamma ** (e >= m))
            return base_lr * mult

        sched = steplr
    elif cfg.lr_scheduler == "cosine":
        import jax.numpy as jnp

        def cosine(step):
            e = epoch_of(step)
            t = jnp.minimum(e / max(cfg.num_epochs, 1), 1.0)
            return base_lr * 0.5 * (1.0 + jnp.cos(jnp.pi * t)) + 1e-8  # eta_min

        sched = cosine
    elif cfg.lr_scheduler == "poly":
        def poly(step):
            e = epoch_of(step)
            return base_lr * (1.0 - e / max(cfg.num_epochs, 1)) ** cfg.poly_exp

        sched = poly
    else:
        raise ValueError(f"unknown lr_scheduler {cfg.lr_scheduler!r}")

    if cfg.warmup_epochs > 0 and cfg.optimizer in ("sgd", "adam"):
        warm_steps = cfg.warmup_epochs * steps_per_epoch

        def warmed(step):
            import jax.numpy as jnp

            frac = jnp.minimum(step / max(warm_steps, 1), 1.0)
            mult = 1.0 + (cfg.warmup_multiplier - 1.0) * frac
            # GradualWarmupScheduler: ramp base_lr -> base_lr*multiplier,
            # then hand over to the wrapped schedule.
            return jnp.where(step < warm_steps, cfg.lr * mult / cfg.warmup_multiplier,
                             sched(step))

        return warmed
    return sched


def lookahead(inner: optax.GradientTransformation, sync_period: int = 6,
              slow_step_size: float = 0.5) -> optax.GradientTransformation:
    """Lookahead (Zhang et al. 2019) as a plain GradientTransformation.

    Unlike `optax.lookahead`, this keeps the slow weights inside the
    optimizer *state*, so callers pass ordinary param pytrees (no
    `LookaheadParams` wrapper). Every `sync_period` steps the slow weights
    take a `slow_step_size` step toward the fast weights and the fast
    weights are reset onto them.
    """
    import jax
    import jax.numpy as jnp

    def init_fn(params):
        return {
            "inner": inner.init(params),
            "slow": jax.tree.map(jnp.asarray, params),
            "step": jnp.zeros([], jnp.int32),
        }

    def update_fn(updates, state, params=None):
        assert params is not None, "lookahead needs params"
        inner_updates, inner_state = inner.update(updates, state["inner"],
                                                  params)
        step = state["step"] + 1
        sync = (step % sync_period) == 0
        fast = jax.tree.map(lambda p, u: p + u, params, inner_updates)
        new_slow = jax.tree.map(
            lambda s, f: jnp.where(sync, s + slow_step_size * (f - s), s),
            state["slow"], fast)
        final = jax.tree.map(
            lambda u, p, s: jnp.where(sync, s - p, u),
            inner_updates, params, new_slow)
        return final, {"inner": inner_state, "slow": new_slow, "step": step}

    return optax.GradientTransformation(init_fn, update_fn)


def scale_grid_updates(mult: float,
                       coarse_mult: float = None) -> optax.GradientTransformation:
    """Per-group lr: scale updates of the encoder grid subtree
    (any leaf whose pytree path contains a dict key 'grid').

    Chained AFTER the base optimizer this multiplies the final (already
    lr-scaled) step, i.e. an exact per-group lr — the TensoRF/NGP recipe
    of training grid tables 20-40x hotter than the MLP heads.

    `coarse_mult` (default: same as `mult`) applies to the COARSE field's
    grid instead. Measured rationale (BASELINE.md round 4): at
    grid_lr_mult 20 the fine field rides the stability edge to 36 dB but
    the coarse field — identical config, trained only on stratified
    64-sample batches — diverges (psnr_coarse ≈ 4.9), leaving a dead
    proposal. A tamer coarse grid lr keeps the proposal alive.
    """
    import jax

    cm = mult if coarse_mult is None else coarse_mult

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def scale(path, u):
            if not any(getattr(k, "key", None) == "grid" for k in path):
                return u
            in_coarse = any(getattr(k, "key", None) == "coarse"
                            for k in path)
            return u * (cm if in_coarse else mult)

        return jax.tree_util.tree_map_with_path(scale, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(cfg, steps_per_epoch: int) -> optax.GradientTransformation:
    sched = make_lr_schedule(cfg, steps_per_epoch)
    if cfg.optimizer == "sgd":
        tx = optax.sgd(sched, momentum=cfg.momentum)
        if cfg.weight_decay:
            tx = optax.chain(optax.add_decayed_weights(cfg.weight_decay), tx)
    elif cfg.optimizer == "adam":
        eps = getattr(cfg, "adam_eps", 1e-8)
        tx = optax.adamw(sched, eps=eps, weight_decay=cfg.weight_decay) \
            if cfg.weight_decay else optax.adam(sched, eps=eps)
    elif cfg.optimizer == "radam":
        tx = optax.radam(sched)
    elif cfg.optimizer == "ranger":
        # ranger = RAdam + Lookahead (reference utils/__init__.py:61-66)
        tx = lookahead(optax.radam(sched), sync_period=6,
                       slow_step_size=0.5)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    mult = getattr(cfg, "grid_lr_mult", 1.0)
    cmult = getattr(cfg, "coarse_grid_lr_mult", None)
    if mult != 1.0 or (cmult is not None and cmult != 1.0):
        tx = optax.chain(tx, scale_grid_updates(mult, cmult))
    return tx
