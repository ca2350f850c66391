"""Categorical policy utilities with action-mask support.

Reference: `marlbase/utils/utils.py:4-24` (`MultiCategorical` over per-agent
torch Categoricals) and the mask-as--1e8-logits convention of
`marlbase/ac/model.py:135-145`. Since agent axes are array axes here, the
"multi" part is just broadcasting — every function operates on logits of
shape (..., A) and maps elementwise over leading axes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MASK_NEG = -1e8


def apply_mask(logits: jnp.ndarray, mask) -> jnp.ndarray:
    """logits * mask + (1 - mask) * -1e8 (`ac/model.py:136-140`)."""
    if mask is None:
        return logits
    return logits * mask + (1.0 - mask) * MASK_NEG


def sample(key, logits: jnp.ndarray) -> jnp.ndarray:
    """Sample actions: (..., A) logits -> (...) int32."""
    return jax.random.categorical(key, logits, axis=-1)


def log_prob(logits: jnp.ndarray, actions: jnp.ndarray) -> jnp.ndarray:
    """Log-probability of actions under softmax(logits); actions (...).

    One-hot select rather than take_along_axis: TPU gathers cost hundreds
    of us at training shapes, a compare+multiply-reduce over A is free."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(actions.astype(jnp.int32), logits.shape[-1], dtype=logp.dtype)
    return jnp.sum(logp * onehot, axis=-1)


def entropy(logits: jnp.ndarray) -> jnp.ndarray:
    """Entropy of softmax(logits) along the last axis.

    Matches torch Categorical.entropy() on masked logits: the -1e8 entries
    receive p ~= 0 and p*logp -> 0 contribution (torch computes
    -(p * logits_normalised) with p==0 giving 0 via p * log p convention).
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(logp)
    # p * logp with p == 0 -> contribute 0 (avoid 0 * -inf)
    plogp = jnp.where(p > 0, p * logp, 0.0)
    return -jnp.sum(plogp, axis=-1)


def mode(logits: jnp.ndarray) -> jnp.ndarray:
    return jnp.argmax(logits, axis=-1)
