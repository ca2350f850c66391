"""Shared training utilities for both algorithm families."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def make_optimizer(
    name: str, lr: float, grad_clip=False, inject_lr: bool = False, clip_mask=None
) -> optax.GradientTransformation:
    """Build the optimizer; torch-default hyperparameters.

    The reference resolves the optimizer by name from torch.optim
    (`dqn/model.py:66-71`) and clips gradients by global norm before the step
    (`dqn/model.py:169-170`) — here clipping composes into the optax chain.

    `clip_mask` (a pytree-prefix of bools, or a callable params->mask)
    restricts BOTH the norm computation and the scaling to the masked
    subtree; unmasked leaves pass through unclipped. This reproduces the
    reference's exact clip scope: `clip_grad_norm_(self.critic.parameters(),
    ...)` touches ONLY the critic — the QMIX mixer's gradients are neither
    counted in the norm nor clipped (`dqn/model.py:170`), even though the
    mixer trains through the same optimizer (`dqn/model.py:370-372`).
    Replicating that scope closed a real learning-dynamics divergence found
    by the round-4 QMIX gate (fw with whole-tree clipping lifted off on
    seeds where the reference stays flat).

    With `inject_lr` the learning rate lives in the optimizer STATE
    (`optax.inject_hyperparams`) instead of being baked into the compiled
    program — the hook that lets a vmapped sweep train different lr values
    in one XLA program (`codebase_tpu/sweep.py`). Set the per-instance lr by
    rewriting `opt_state.hyperparams["learning_rate"]` after `init`.
    """

    def build(learning_rate):
        n = name.lower()
        if n == "adam":
            opt = optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8)
        elif n == "rmsprop":
            opt = optax.rmsprop(learning_rate, decay=0.99, eps=1e-8)
        elif n == "sgd":
            opt = optax.sgd(learning_rate)
        elif n == "adamw":
            opt = optax.adamw(learning_rate)
        else:
            raise ValueError(f"unknown optimizer {name!r}")
        if grad_clip:
            clip = optax.clip_by_global_norm(float(grad_clip))
            if clip_mask is not None:
                clip = optax.masked(clip, clip_mask)
            return optax.chain(clip, opt)
        return opt

    if inject_lr:
        return optax.inject_hyperparams(build)(learning_rate=lr)
    return build(lr)


def tree_where(cond, a, b):
    """Elementwise-broadcast `where` over matching pytrees (traced cond)."""
    return jax.tree.map(lambda x, y: jnp.where(cond, x, y), a, b)


def soft_update(target, source, tau: float):
    """Polyak update: target <- (1 - tau) * target + tau * source
    (`dqn/model.py:187-193`, `ac/model.py:184-187`)."""
    return jax.tree.map(lambda t, s: (1.0 - tau) * t + tau * s, target, source)


def periodic_hard_update(target, source, do_update):
    """Hard copy gated on a traced condition."""
    return tree_where(do_update, source, target)


def global_norm(tree) -> jnp.ndarray:
    return optax.global_norm(tree)


def early_exit_option(acfg):
    """Resolve the `rollout_early_exit` config knob for `collect_episodes`:
    "auto" (default; while_loop early exit at E >= 512, scan below) or a
    forced "on"/"off" — the tracked A/B toggle for arbitrating collector
    regressions on wide-batch lanes (both variants are bit-identical;
    `envs/vector.py`)."""
    opt = acfg.get("rollout_early_exit", "auto")
    if opt in ("auto", None):
        return "auto"
    if opt in ("on", True, "true"):
        return True
    if opt in ("off", False, "false"):
        return False
    raise ValueError(f"rollout_early_exit must be auto/on/off, got {opt!r}")
