"""Functional wrapper combinators over the `Environment` API.

Reference: `marlbase/utils/wrappers.py` (gym wrapper classes mutated per
step). Here each wrapper is a frozen dataclass that holds the inner env and
returns transformed pure reset/step functions; wrapper state (step counters,
streaming statistics) rides along in a small struct wrapping the inner state,
so the whole stack is jittable and vmappable.

Order of application mirrors the reference factory
(`marlbase/utils/envs.py:23-56`):
    base -> TimeLimit -> [episode stats: handled by the rollout harness from
    TimeStep.stat_reward] -> ObserveID -> StandardiseReward -> named wrappers
    (e.g. CooperativeReward).
`ClearInfo` has no equivalent here (there is no info dict to clear), and
`RecordEpisodeStatistics` is replaced by the `stat_reward` field plus masked
sums in the rollout (see `codebase_tpu/envs/vector.py`).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
from flax import struct

from codebase_tpu.envs.api import Environment, TimeStep


@dataclass(frozen=True)
class WrapperBase(Environment):
    env: Environment

    @property
    def n_agents(self):
        return self.env.n_agents

    @property
    def obs_dim(self):
        return self.env.obs_dim

    @property
    def n_actions(self):
        return self.env.n_actions

    @property
    def has_action_mask(self):
        return self.env.has_action_mask

    @property
    def integer_valued_obs(self):
        # ObserveID prepends 0/1 one-hots and the reward wrappers leave obs
        # untouched, so integrality is inherited from the base env
        return self.env.integer_valued_obs

    @property
    def base_env(self):
        env = self.env
        while isinstance(env, WrapperBase):
            env = env.env
        return env

    def render_frame(self, state):
        return self.base_env.render_frame(self.inner_state(state))

    def inner_state(self, state):
        """Fully unwrap a wrapped state down to the base env state.

        Default: this wrapper adds no state of its own, recurse unchanged.
        Stateful wrappers strip their layer first (override)."""
        return self.env.inner_state(state)


# --------------------------------------------------------------------------


@struct.dataclass
class TimeLimitState:
    inner: object
    t: jnp.ndarray  # () int32


@dataclass(frozen=True)
class TimeLimit(WrapperBase):
    """Episode truncation after `limit` steps (gym.wrappers.TimeLimit as used
    at `utils/envs.py:41,96`): sets `truncated`, leaves `terminated` as-is."""

    limit: int = 25

    def reset(self, key):
        s, ts = self.env.reset(key)
        return TimeLimitState(inner=s, t=jnp.asarray(0, jnp.int32)), ts

    def step(self, state, actions, key):
        s, ts = self.env.step(state.inner, actions, key)
        t = state.t + 1
        truncated = jnp.logical_or(ts.truncated, t >= self.limit)
        return TimeLimitState(inner=s, t=t), ts.replace(truncated=truncated)

    def reset_batch(self, key, n):
        s, ts = self.env.reset_batch(key, n)
        return TimeLimitState(inner=s, t=jnp.zeros((n,), jnp.int32)), ts

    def step_batch(self, state, actions, key):
        s, ts = self.env.step_batch(state.inner, actions, key)
        t = state.t + 1
        truncated = jnp.logical_or(ts.truncated, t >= self.limit)
        return TimeLimitState(inner=s, t=t), ts.replace(truncated=truncated)

    def inner_state(self, state):
        return self.env.inner_state(state.inner)


@dataclass(frozen=True)
class ObserveID(WrapperBase):
    """Prepend a one-hot agent id to each observation
    (`utils/wrappers.py:75-103`)."""

    @property
    def obs_dim(self):
        return self.env.obs_dim + self.env.n_agents

    def _augment(self, ts: TimeStep) -> TimeStep:
        n = self.env.n_agents
        eye = jnp.eye(n, dtype=ts.obs.dtype)
        eye = jnp.broadcast_to(eye, ts.obs.shape[:-1] + (n,))
        return ts.replace(obs=jnp.concatenate([eye, ts.obs], axis=-1))

    def reset(self, key):
        s, ts = self.env.reset(key)
        return s, self._augment(ts)

    def step(self, state, actions, key):
        s, ts = self.env.step(state, actions, key)
        return s, self._augment(ts)

    def reset_batch(self, key, n):
        s, ts = self.env.reset_batch(key, n)
        return s, self._augment(ts)

    def step_batch(self, state, actions, key):
        s, ts = self.env.step_batch(state, actions, key)
        return s, self._augment(ts)


@dataclass(frozen=True)
class CooperativeReward(WrapperBase):
    """Replace each agent's reward with the team sum
    (`utils/wrappers.py:106-108`; wired for VDN/QMIX in
    `configs/algorithm/vdn.yaml:6-8`). `stat_reward` stays raw, matching the
    reference where `RecordEpisodeStatistics` sits below this wrapper."""

    def _team(self, ts: TimeStep) -> TimeStep:
        team = jnp.sum(ts.reward, axis=-1, keepdims=True)
        return ts.replace(reward=jnp.broadcast_to(team, ts.reward.shape))

    def reset(self, key):
        return self.env.reset(key)

    def step(self, state, actions, key):
        s, ts = self.env.step(state, actions, key)
        return s, self._team(ts)

    def reset_batch(self, key, n):
        return self.env.reset_batch(key, n)

    def step_batch(self, state, actions, key):
        s, ts = self.env.step_batch(state, actions, key)
        return s, self._team(ts)


@struct.dataclass
class StandardiseRewardState:
    inner: object
    sumw: jnp.ndarray  # (N,)
    wmean: jnp.ndarray  # (N,)
    tvar: jnp.ndarray  # (N,)
    n: jnp.ndarray  # () float32


@dataclass(frozen=True)
class StandardiseReward(WrapperBase):
    """Streaming per-agent reward standardisation, the exact update of
    `utils/wrappers.py:111-141` (West's weighted incremental algorithm with
    unit weights). Statistics persist across episodes — they live in the
    wrapper state and are only reinitialised on `reset`, whereas the
    reference's persist for the lifetime of the env object; for the
    vectorised rollouts here, each env instance's stream restarts per
    episode. `stat_reward` stays raw."""

    def _init_state(self, s, reward_like):
        zeros = jnp.zeros_like(reward_like)
        return StandardiseRewardState(
            inner=s, sumw=zeros, wmean=zeros, tvar=zeros, n=jnp.asarray(0.0, jnp.float32)
        )

    def _update(self, state, s, ts):
        reward = ts.reward
        q = reward - state.wmean
        temp_sumw = state.sumw + 1.0
        r = q / temp_sumw
        wmean = state.wmean + r
        tvar = state.tvar + q * r * state.sumw
        n = state.n + 1.0
        var = (tvar * n) / (temp_sumw * jnp.maximum(n - 1.0, 1e-9))
        std_reward = (reward - wmean) / (jnp.sqrt(jnp.maximum(var, 0.0)) + 1e-6)
        out = jnp.where(n <= 1.0, reward, std_reward)
        new_state = StandardiseRewardState(inner=s, sumw=temp_sumw, wmean=wmean, tvar=tvar, n=n)
        return new_state, ts.replace(reward=out)

    def reset(self, key):
        s, ts = self.env.reset(key)
        return self._init_state(s, ts.reward), ts

    def step(self, state, actions, key):
        s, ts = self.env.step(state.inner, actions, key)
        return self._update(state, s, ts)

    def reset_batch(self, key, n):
        s, ts = self.env.reset_batch(key, n)
        return self._init_state(s, ts.reward), ts

    def step_batch(self, state, actions, key):
        s, ts = self.env.step_batch(state.inner, actions, key)
        return self._update(state, s, ts)

    def inner_state(self, state):
        return self.env.inner_state(state.inner)


@dataclass(frozen=True)
class FlattenObservation(WrapperBase):
    """Per-agent observation flattening (`utils/wrappers.py:48-72`).

    Accepted for config compatibility with the reference's wrapper list;
    every env in this framework already emits flat (N, D) observations, so
    this is the identity."""

    def reset(self, key):
        return self.env.reset(key)

    def step(self, state, actions, key):
        return self.env.step(state, actions, key)

    def reset_batch(self, key, n):
        return self.env.reset_batch(key, n)

    def step_batch(self, state, actions, key):
        return self.env.step_batch(state, actions, key)


NAMED_WRAPPERS = {
    "CooperativeReward": CooperativeReward,
    "ObserveID": ObserveID,
    "StandardiseReward": StandardiseReward,
    "FlattenObservation": FlattenObservation,
}
