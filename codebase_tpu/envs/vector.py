"""Vectorised episode collection: vmap over envs, lax.scan over time.

This replaces both hot loops of the reference:
- the DQN per-episode python while-loop (`marlbase/dqn/train.py:202-237`),
- the AC AsyncVectorEnv loop that runs until every parallel env finishes,
  freezing finished envs under a `running` mask
  (`marlbase/ac/train.py:24-119`).

Semantics reproduced exactly:
- every rollout starts with a fresh `reset` (both reference families reset
  per episode, so hidden state and env state never leak across episodes);
- a fixed T = time_limit step scan with a per-env `running` mask;
- finished envs record nothing: their obs/reward/done/filled entries remain
  zero, including the reference quirk that `done` is only True at the single
  step an episode ends (`ac/train.py:90-99`) — zero-padded observations after
  episode end are bootstrapped from just like the reference's zero-filled
  batches;
- `dones` stores "proper" termination per `use_proper_termination`
  (`dqn/train.py:219-226`, `ac/train.py:86-88`): when False, truncation
  counts as termination for the learner.

Episode statistics are masked sums of `stat_reward` (raw env rewards, the
quantity `RecordEpisodeStatistics` logs in the reference,
`utils/wrappers.py:31-45`).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import struct

from codebase_tpu.envs.api import Environment


@struct.dataclass
class Rollout:
    """One batch of padded episodes. Shapes: T steps, E envs, N agents."""

    obs: jnp.ndarray  # (T+1, E, N, D)
    actions: jnp.ndarray  # (T, E, N) int32
    rewards: jnp.ndarray  # (T, E, N) training rewards
    stat_rewards: jnp.ndarray  # (T, E, N) raw rewards for episode stats
    dones: jnp.ndarray  # (T+1, E) float32 "proper" termination flags
    filled: jnp.ndarray  # (T, E) float32
    action_mask: jnp.ndarray  # (T+1, E, N, A) float32

    @property
    def episode_returns(self):
        """(E, N) per-agent raw episode returns."""
        return jnp.sum(self.stat_rewards * self.filled[..., None], axis=0)

    @property
    def episode_lengths(self):
        """(E,) episode lengths."""
        return jnp.sum(self.filled, axis=0)

    @property
    def env_steps(self):
        """() total environment steps collected (sum of episode lengths)."""
        return jnp.sum(self.filled)


def collect_episodes(
    env: Environment,
    policy: Callable,
    policy_carry,
    key,
    n_envs: int,
    time_limit: int,
    use_proper_termination: bool = False,
    env_sharding=None,
    early_exit="auto",
):
    """Collect one full (padded) episode from each of `n_envs` instances.

    Args:
        env: environment spec.
        policy: `(carry, obs (E,N,D), mask (E,N,A), key) -> (carry, actions
            (E,N) int32)`. The carry typically holds RNN hiddens; it is
            re-initialised by the caller per rollout (episodes never span
            rollouts).
        policy_carry: initial policy carry.
        key: PRNG key.
        n_envs: number of parallel env instances E.
        time_limit: maximum episode length T (scan length).
        use_proper_termination: when False (the reference default), truncation
            is recorded as termination for the learner.
        early_exit: stop the time loop at the first step with no running
            episode (lax.while_loop over preallocated buffers) instead of a
            fixed-length lax.scan. Bit-identical outputs either way (the
            scan's running mask records exactly the buffers' fill values).
            "auto" enables it only for wide env batches (E >= 512), where
            round-4 profiling showed the win (SMAClite 16k envs: max episode
            ~41 of T=60 — a third of rollout compute was finished-env
            stepping, +23% env-steps/s); at small E the while_loop's
            per-step overhead measured far above the scan's (the E=1
            reference-cadence gate lane ran ~9x slower), so scan stays.

    Returns:
        (Rollout, final policy carry)
    """
    if early_exit == "auto":
        # wide batches amortise the while_loop's per-step all-done check —
        # but only for envs that CAN end before the horizon (RWARE cannot:
        # Environment.early_termination_possible)
        early_exit = n_envs >= 512 and env.early_termination_possible
    def constrain(ts):
        """Pin the leading env axis of every TimeStep field to the mesh's
        data axis; GSPMD propagates the sharding through the batched step
        and everything derived (including env states of any layout)."""
        if env_sharding is None:
            return ts
        from jax.sharding import NamedSharding, PartitionSpec

        def c(x):
            spec = PartitionSpec(
                *(list(env_sharding.spec) + [None] * (x.ndim - len(env_sharding.spec)))
            )
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(env_sharding.mesh, spec)
            )

        return jax.tree.map(c, ts)

    k_reset, k_scan = jax.random.split(key)
    states, ts0 = env.reset_batch(k_reset, n_envs)
    ts0 = constrain(ts0)

    def step_fn(carry, k):
        states, ts, running, pol_carry = carry
        k_act, k_env = jax.random.split(k)
        pol_carry, actions = policy(pol_carry, ts.obs, ts.action_mask, k_act)
        # the carried TimeStep already holds `states`' availability mask;
        # passing it lets masked envs skip recomputing it for the validity
        # check (bit-identical, see Environment.step_batch)
        new_states, new_ts = env.step_batch(states, actions, k_env, ts.action_mask)
        new_ts = constrain(new_ts)

        done = new_ts.done  # (E,)
        if use_proper_termination:
            proper_done = new_ts.terminated
        else:
            proper_done = done

        rmask = running.astype(jnp.float32)
        out = dict(
            obs=new_ts.obs * rmask[:, None, None],
            actions=(actions * running[:, None]).astype(jnp.int32),
            rewards=new_ts.reward * rmask[:, None],
            stat_rewards=new_ts.stat_reward * rmask[:, None],
            dones=proper_done.astype(jnp.float32) * rmask,
            filled=rmask,
            action_mask=jnp.where(
                running[:, None, None], new_ts.action_mask, jnp.ones_like(new_ts.action_mask)
            ),
        )
        still_running = running & ~done
        return (new_states, new_ts, still_running, pol_carry), out

    running0 = jnp.ones((n_envs,), bool)
    keys = jax.random.split(k_scan, time_limit)  # same stream either path

    if early_exit:
        # Early-exit time loop: a `lax.scan` would execute all T steps even
        # after every episode has terminated, and short-episode envs make
        # that pure waste (SMAClite 3m at 16k envs: max episode length ~41
        # of T=60 — a third of the rollout compute, round-4 profiling). A
        # while_loop writing into preallocated (T, ...) buffers is
        # bit-identical — finished envs record zeros (mask: ones) exactly
        # like the masked scan did, unreached timesteps keep the identical
        # initial values, and the per-step RNG keys are the same presplit
        # array a scan would consume — but stops at the first step where no
        # env is running.
        traj0 = dict(
            obs=jnp.zeros((time_limit,) + ts0.obs.shape, ts0.obs.dtype),
            actions=jnp.zeros((time_limit, n_envs) + ts0.obs.shape[1:2], jnp.int32),
            rewards=jnp.zeros((time_limit,) + ts0.reward.shape, jnp.float32),
            stat_rewards=jnp.zeros((time_limit,) + ts0.reward.shape, jnp.float32),
            dones=jnp.zeros((time_limit, n_envs), jnp.float32),
            filled=jnp.zeros((time_limit, n_envs), jnp.float32),
            action_mask=jnp.ones(
                (time_limit,) + ts0.action_mask.shape, ts0.action_mask.dtype
            ),
        )

        def cond(loop):
            t, carry, _ = loop
            running = carry[2]
            return (t < time_limit) & jnp.any(running)

        def body(loop):
            t, carry, traj = loop
            carry, out = step_fn(carry, keys[t])
            traj = {
                k: jax.lax.dynamic_update_slice(
                    buf, out[k][None].astype(buf.dtype), (t,) + (0,) * (buf.ndim - 1)
                )
                for k, buf in traj.items()
            }
            return t + 1, carry, traj

        _, (_, _, _, pol_carry), traj = jax.lax.while_loop(
            cond,
            body,
            (jnp.asarray(0, jnp.int32), (states, ts0, running0, policy_carry), traj0),
        )
    else:
        (_, _, _, pol_carry), traj = jax.lax.scan(
            step_fn, (states, ts0, running0, policy_carry), keys
        )

    rollout = Rollout(
        obs=jnp.concatenate([ts0.obs[None], traj["obs"]], axis=0),
        actions=traj["actions"],
        rewards=traj["rewards"],
        stat_rewards=traj["stat_rewards"],
        dones=jnp.concatenate(
            [jnp.zeros((1, n_envs), jnp.float32), traj["dones"]], axis=0
        ),
        filled=traj["filled"],
        action_mask=jnp.concatenate([ts0.action_mask[None], traj["action_mask"]], axis=0),
    )
    return rollout, pol_carry


def autoreset_step(env: Environment):
    """Build a step function that resets on episode end — for continuous
    (non-episodic) stepping, e.g. pure env throughput benchmarks."""

    def step(states, actions, key):
        k_step, k_reset = jax.random.split(key)
        n = actions.shape[0]
        new_states, ts = jax.vmap(env.step)(states, actions, jax.random.split(k_step, n))
        reset_states, reset_ts = jax.vmap(env.reset)(jax.random.split(k_reset, n))
        done = ts.done

        def pick(a, b):
            mask = done.reshape((-1,) + (1,) * (a.ndim - 1))
            return jnp.where(mask, a, b)

        states_out = jax.tree.map(pick, reset_states, new_states)
        obs_out = jnp.where(done[:, None, None], reset_ts.obs, ts.obs)
        mask_out = jnp.where(done[:, None, None], reset_ts.action_mask, ts.action_mask)
        return states_out, ts.replace(obs=obs_out, action_mask=mask_out)

    return step
