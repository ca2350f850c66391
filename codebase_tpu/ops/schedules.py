"""Exploration schedules as pure functions of the (traced) step counter.

Reference behaviour: `marlbase/dqn/train.py:127-174` (`_epsilon_schedule`)
builds a host-side closure mapping python ints to epsilon. Here the schedule
is a jittable function of a (possibly traced) step so that it can live inside
the on-device train iteration.
"""

from __future__ import annotations

import jax.numpy as jnp


def epsilon_schedule(
    decay_style: str,
    decay_over: float,
    eps_start: float,
    eps_end: float,
    exp_decay_rate: float,
    total_steps: int,
):
    """Build an epsilon schedule fn: step -> epsilon (jnp scalar).

    Mirrors `marlbase/dqn/train.py:152-174`:
      linear:      eps_end + (eps_start-eps_end) * (1 - step/(total*decay_over)),
                   floored at eps_end.
      exponential: eps_end + (eps_start-eps_end) * exp(-k*step) with
                   k = (eps_start-eps_end) / (total*decay_over) * exp_decay_rate,
                   floored at eps_end.
    """
    if decay_style in ("linear", "lin"):
        style = "linear"
    elif decay_style in ("exponential", "exp"):
        style = "exponential"
    else:
        raise ValueError("decay_style must be one of 'linear' or 'exponential'")
    assert 0 <= eps_start <= 1 and 0 <= eps_end <= 1, "eps must be in [0, 1]"
    assert eps_start >= eps_end, "eps_start must be >= eps_end"
    assert 0 < decay_over <= 1, "decay_over must be in (0, 1]"
    assert total_steps > 0, "total_steps must be > 0"
    assert exp_decay_rate > 0, "exp_decay_rate must be > 0"

    span = float(total_steps) * float(decay_over)

    if style == "linear":

        def schedule(step):
            step = jnp.asarray(step, jnp.float32)
            eps = eps_end + (eps_start - eps_end) * (1.0 - step / span)
            return jnp.maximum(eps, eps_end)

    else:
        k = (eps_start - eps_end) / span * exp_decay_rate

        def schedule(step):
            step = jnp.asarray(step, jnp.float32)
            eps = eps_end + (eps_start - eps_end) * jnp.exp(-k * step)
            return jnp.maximum(eps, eps_end)

    return schedule
