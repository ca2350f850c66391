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

    # reward-transforming wrappers override this with a pure fn over a
    # (..., N) reward array (used by `standardisation_plan` to re-order
    # transforms around the StandardiseReward marker)
    reward_transform = None

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
    def early_termination_possible(self):
        return self.env.early_termination_possible

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

    def step_batch(self, state, actions, key, current_mask=None):
        s, ts = self.env.step_batch(state.inner, actions, key, current_mask)
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

    def step_batch(self, state, actions, key, current_mask=None):
        s, ts = self.env.step_batch(state, actions, key, current_mask)
        return s, self._augment(ts)


@dataclass(frozen=True)
class CooperativeReward(WrapperBase):
    """Replace each agent's reward with the team sum
    (`utils/wrappers.py:106-108`; wired for VDN/QMIX in
    `configs/algorithm/vdn.yaml:6-8`). `stat_reward` stays raw, matching the
    reference where `RecordEpisodeStatistics` sits below this wrapper."""

    def reward_transform(self, reward):
        team = jnp.sum(reward, axis=-1, keepdims=True)
        return jnp.broadcast_to(team, reward.shape)

    def _team(self, ts: TimeStep) -> TimeStep:
        return ts.replace(reward=self.reward_transform(ts.reward))

    def reset(self, key):
        return self.env.reset(key)

    def step(self, state, actions, key):
        s, ts = self.env.step(state, actions, key)
        return s, self._team(ts)

    def reset_batch(self, key, n):
        return self.env.reset_batch(key, n)

    def step_batch(self, state, actions, key, current_mask=None):
        s, ts = self.env.step_batch(state, actions, key, current_mask)
        return s, self._team(ts)


@dataclass(frozen=True)
class StandardiseReward(WrapperBase):
    """Marker: the reward-standardisation point in the wrapper stack.

    The reference wrapper (`utils/wrappers.py:111-141`) keeps West's
    streaming moments for the *lifetime of each env worker*. A stateful
    in-stack version cannot reproduce that under the functional API: every
    rollout re-resets wrapper state (round-1 behavior: streams restarted per
    episode) and finished envs keep stepping inside the fixed-T scan, which
    would pollute the moments with post-done rewards. So this wrapper is a
    pure passthrough; `standardisation_plan` detects its position and the
    train loops thread a persistent per-env-instance `RewardStream`
    (`ops/reward_stream.py`) through TrainState, updated exactly once per
    filled step — the reference's lifetime semantics at batch scale.
    """

    def reset(self, key):
        return self.env.reset(key)

    def step(self, state, actions, key):
        return self.env.step(state, actions, key)

    def reset_batch(self, key, n):
        return self.env.reset_batch(key, n)

    def step_batch(self, state, actions, key, current_mask=None):
        return self.env.step_batch(state, actions, key, current_mask)


@dataclass(frozen=True)
class RewardPlan:
    """Reward transforms around a StandardiseReward marker, innermost first.

    `below` rebuilds the standardiser's input from raw `stat_reward`s;
    `above` re-applies the outer transforms to the standardised output
    (mirroring the reference's wrapper-application order,
    `utils/envs.py:42-54`)."""

    below: tuple
    above: tuple


def standardisation_plan(env):
    """Return a `RewardPlan` if `env`'s wrapper stack contains a
    StandardiseReward marker, else None."""
    chain = []  # outermost first
    e = env
    while isinstance(e, WrapperBase):
        chain.append(e)
        e = e.env
    idx = next(
        (i for i, w in enumerate(chain) if isinstance(w, StandardiseReward)), None
    )
    if idx is None:
        return None
    above = tuple(
        w.reward_transform
        for w in reversed(chain[:idx])
        if w.reward_transform is not None
    )
    below = tuple(
        w.reward_transform
        for w in reversed(chain[idx + 1 :])
        if w.reward_transform is not None
    )
    return RewardPlan(below=below, above=above)


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

    def step_batch(self, state, actions, key, current_mask=None):
        return self.env.step_batch(state, actions, key, current_mask)


def _identity_wrapper(env):
    """No-op for reference wrapper names whose effect is built in here:
    episode statistics are always recorded by `collect_episodes`, and there
    is no info dict to clear in the functional API."""
    return env


NAMED_WRAPPERS = {
    "CooperativeReward": CooperativeReward,
    "ObserveID": ObserveID,
    "StandardiseReward": StandardiseReward,
    "FlattenObservation": FlattenObservation,
    # reference/gym.wrappers names with built-in or equivalent behaviour
    # (`marlbase/utils/envs.py:47-54` resolves names from its own module
    # then from gym.wrappers; accept the same config surface)
    "RecordEpisodeStatistics": _identity_wrapper,
    "ClearInfo": _identity_wrapper,
    "NormalizeReward": StandardiseReward,
}
