"""Shared training utilities for both algorithm families."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def make_optimizer(name: str, lr: float, grad_clip=False) -> optax.GradientTransformation:
    """Build the optimizer; torch-default hyperparameters.

    The reference resolves the optimizer by name from torch.optim
    (`dqn/model.py:66-71`) and clips gradients by global norm before the step
    (`dqn/model.py:169-170`) — here clipping composes into the optax chain.
    """
    name = name.lower()
    if name == "adam":
        opt = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    elif name == "rmsprop":
        opt = optax.rmsprop(lr, decay=0.99, eps=1e-8)
    elif name == "sgd":
        opt = optax.sgd(lr)
    elif name == "adamw":
        opt = optax.adamw(lr)
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    if grad_clip:
        return optax.chain(optax.clip_by_global_norm(float(grad_clip)), opt)
    return opt


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
