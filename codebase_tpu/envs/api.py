"""Functional multi-agent environment API.

The reference steps Gymnasium environments in python processes
(`marlbase/utils/envs.py`), with the multi-agent contract "rewards are a
list, one per agent" (README.md:69). Here an environment is a *static spec
object* with two pure functions over pytrees:

    state, ts = env.reset(key)
    state, ts = env.step(state, actions, key)

so that thousands of instances run under `jax.vmap`/`jit` on a TPU chip and
the whole rollout lives inside `lax.scan`.

Conventions:
- `actions`: (n_agents,) int32.
- `TimeStep.obs`: (n_agents, obs_dim) float32.
- `TimeStep.reward`: (n_agents,) float32 — the reward the learner trains on
  (wrappers may transform it).
- `TimeStep.stat_reward`: the raw per-agent env reward used for episode
  statistics. The reference records statistics *below* the reward-transforming
  wrappers (`RecordEpisodeStatistics` is applied before `StandardiseReward`
  and the config-listed `CooperativeReward`, `utils/envs.py:42-54`), so the
  logged `episode_returns` are always raw env returns; `stat_reward`
  reproduces that.
- `TimeStep.terminated` / `truncated`: () bool, shared across agents (the
  reference envs end episodes globally).
- `TimeStep.action_mask`: (n_agents, n_actions) float32; all-ones when the
  env does not mask (`env.has_action_mask` says whether it is meaningful,
  mirroring the `info["action_mask"]` convention of
  `marlbase/utils/smaclite_wrapper.py:14-17`).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class TimeStep:
    obs: jnp.ndarray  # (N, D) float32
    reward: jnp.ndarray  # (N,) float32
    stat_reward: jnp.ndarray  # (N,) float32
    terminated: jnp.ndarray  # () bool
    truncated: jnp.ndarray  # () bool
    action_mask: jnp.ndarray  # (N, A) float32

    @property
    def done(self):
        return jnp.logical_or(self.terminated, self.truncated)


class Environment:
    """Static environment spec. Subclasses are frozen dataclasses so they
    hash/compare by config and can be closed over inside jit."""

    # --- static properties every env must provide -------------------------
    @property
    def n_agents(self) -> int:
        raise NotImplementedError

    @property
    def obs_dim(self) -> int:
        raise NotImplementedError

    @property
    def n_actions(self) -> int:
        raise NotImplementedError

    @property
    def has_action_mask(self) -> bool:
        return False

    @property
    def obs_dims(self) -> Tuple[int, ...]:
        return (self.obs_dim,) * self.n_agents

    @property
    def action_dims(self) -> Tuple[int, ...]:
        return (self.n_actions,) * self.n_agents

    # --- pure functions ---------------------------------------------------
    def reset(self, key):
        """key -> (state, TimeStep). Reward fields are zero."""
        raise NotImplementedError

    def step(self, state, actions, key):
        """(state, (N,) int32, key) -> (state, TimeStep)."""
        raise NotImplementedError

    # --- batched interface -------------------------------------------------
    # The rollout harness (`codebase_tpu/envs/vector.py`) always steps E env
    # instances through these. Contract: TimeStep fields gain a LEADING env
    # axis E — obs (E, N, D), reward (E, N), terminated (E,), ... — while the
    # batched `state` is an opaque pytree the env chooses. The defaults vmap
    # the single-instance functions (key streams identical to splitting the
    # key per env). Envs override them with a natively batched layout when it
    # pays: on TPU, elementwise work on (E, N, F)-shaped intermediates with
    # tiny trailing dims wastes the 128-wide vector lanes; storing the batch
    # env-axis-LAST (struct-of-arrays, e.g. `LBFBatchState` in
    # `envs/lbforaging.py`) runs the same logic at full lane utilisation
    # (~10x faster rollouts at E=8192).

    def reset_batch(self, key, n: int):
        """key, n -> (batched state, TimeStep with leading env axis n)."""
        import jax

        return jax.vmap(self.reset)(jax.random.split(key, n))

    def step_batch(self, state, actions, key, current_mask=None):
        """(batched state, (E, N) int32, key) -> (batched state, TimeStep
        with leading env axis E).

        `current_mask` ((E, N, A), optional): the availability mask of
        `state`, when the caller already carries it (rollout loops hold the
        previous TimeStep). Envs MAY consume it to skip recomputing
        availability for action-validity checks; it never changes results.
        The vmap fallback ignores it."""
        import jax

        del current_mask
        return jax.vmap(self.step)(state, actions, jax.random.split(key, actions.shape[0]))

    # --- optional helpers -------------------------------------------------
    def full_ones_mask(self):
        return jnp.ones((self.n_agents, self.n_actions), jnp.float32)

    def render_frame(self, state) -> "np.ndarray":  # noqa: F821
        """Host-side RGB rendering of a (single, unbatched) state."""
        raise NotImplementedError(f"{type(self).__name__} does not support rendering")

    def inner_state(self, state):
        """Unwrap a (possibly wrapper-nested) state down to the base env
        state; identity for base envs, overridden by stateful wrappers."""
        return state

    @property
    def integer_valued_obs(self) -> bool:
        """True when every observation entry is a small integer (grid
        coords, levels, one-hots) — exactly representable in bfloat16, so
        low-precision replay storage is lossless. Default False (e.g.
        SMAClite emits fractional hp features)."""
        return False

    @property
    def early_termination_possible(self) -> bool:
        """False when episodes can only end at the env's fixed horizon
        (e.g. RWARE: `terminated = t >= max_steps`, no other terminal
        condition). The early-exit episode collector (`envs/vector.py`)
        can then never stop before the scan length, so its per-step
        all-done check is pure overhead and `early_exit="auto"` resolves
        to the plain scan. Default True (LBF ends when food is collected,
        SMAClite on elimination)."""
        return True
