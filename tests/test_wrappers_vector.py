"""Tests for wrapper combinators and the vectorised rollout harness."""

import numpy as np
import jax
import jax.numpy as jnp

from codebase_tpu.envs.factory import make_env
from codebase_tpu.envs.vector import autoreset_step, collect_episodes
from codebase_tpu.envs import wrappers as W
from codebase_tpu.envs.lbforaging import LevelBasedForaging


def random_policy(n_actions):
    def policy(carry, obs, mask, key):
        E, N = obs.shape[:2]
        actions = jax.random.randint(key, (E, N), 0, n_actions)
        return carry, actions

    return policy


class TestFactory:
    def test_stack_composition(self):
        env = make_env(
            "lbforaging:Foraging-8x8-2p-3f-v3",
            time_limit=25,
            observe_id=True,
            wrappers=["CooperativeReward"],
        )
        # obs_dim grows by n_agents
        assert env.obs_dim == 15 + 2
        assert env.n_agents == 2 and env.n_actions == 6

    def test_unknown_name(self):
        import pytest

        with pytest.raises(ValueError):
            make_env("nethack", time_limit=10)


class TestTimeLimit:
    def test_truncates_at_limit(self):
        env = make_env("Foraging-8x8-2p-1f-v3", time_limit=5)
        key = jax.random.PRNGKey(0)
        state, ts = env.reset(key)
        for t in range(5):
            state, ts = env.step(state, jnp.zeros(2, jnp.int32), key)
        assert bool(ts.truncated)


class TestCooperativeReward:
    def test_team_sum_and_raw_stats(self):
        base = LevelBasedForaging(rows=8, cols=8, num_agents=2, max_food=1, sight=8)
        env = W.CooperativeReward(base)
        from tests.test_lbforaging import manual_state

        state = manual_state(
            agent_pos=[[4, 3], [0, 0]],
            agent_level=[2, 1],
            food_pos=[[4, 4]],
            food_level=[2],
            food_active=[True],
        )
        from codebase_tpu.envs.lbforaging import LOAD, NONE

        _, ts = env.step(state, jnp.asarray([LOAD, NONE]), jax.random.PRNGKey(0))
        # training reward = team sum broadcast; stat_reward stays raw
        np.testing.assert_allclose(np.asarray(ts.reward), [1.0, 1.0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(ts.stat_reward), [1.0, 0.0], atol=1e-6)


class TestStandardiseReward:
    def test_streaming_matches_reference_algorithm(self):
        """Replicate `utils/wrappers.py:119-141` in numpy and compare."""
        env = make_env("Foraging-8x8-2p-2f-v3", time_limit=30, standardise_rewards=True)
        key = jax.random.PRNGKey(3)
        state, ts = env.reset(key)
        sumw = np.zeros(2, np.float32)
        wmean = np.zeros(2, np.float32)
        tvar = np.zeros(2, np.float32)
        n = 0
        for t in range(10):
            key, k1, k2 = jax.random.split(key, 3)
            actions = jax.random.randint(k1, (2,), 0, 6)
            state, ts = env.step(state, actions, k2)
            raw = np.asarray(ts.stat_reward)
            q = raw - wmean
            temp = sumw + 1.0
            r = q / temp
            wmean = wmean + r
            tvar = tvar + q * r * sumw
            sumw = temp
            n += 1
            if n == 1:
                expected = raw
            else:
                var = (tvar * n) / (sumw * (n - 1))
                expected = (raw - wmean) / (np.sqrt(var) + 1e-6)
            np.testing.assert_allclose(np.asarray(ts.reward), expected, atol=1e-4)


class TestCollectEpisodes:
    def test_shapes_and_masking(self):
        env = make_env("Foraging-8x8-2p-3f-v3", time_limit=25)
        rollout, _ = collect_episodes(
            env, random_policy(6), None, jax.random.PRNGKey(0), n_envs=16, time_limit=25
        )
        assert rollout.obs.shape == (26, 16, 2, 15)
        assert rollout.actions.shape == (25, 16, 2)
        assert rollout.dones.shape == (26, 16)
        filled = np.asarray(rollout.filled)
        dones = np.asarray(rollout.dones)
        for e in range(16):
            length = int(filled[:, e].sum())
            assert 1 <= length <= 25
            # filled is a prefix mask
            np.testing.assert_array_equal(filled[:length, e], 1.0)
            np.testing.assert_array_equal(filled[length:, e], 0.0)
            # done recorded exactly at episode end (and nowhere else)
            assert dones[length, e] == 1.0
            assert dones[:length, e].sum() == 0.0
            assert dones[length + 1 :, e].sum() == 0.0

    def test_episode_returns_match_masked_sum(self):
        env = make_env("Foraging-8x8-2p-3f-v3", time_limit=25)
        rollout, _ = collect_episodes(
            env, random_policy(6), None, jax.random.PRNGKey(1), n_envs=8, time_limit=25
        )
        returns = np.asarray(rollout.episode_returns)
        assert returns.shape == (8, 2)
        assert (returns >= 0).all()
        # normalised lbf rewards: total team return <= 1 per episode
        assert (returns.sum(-1) <= 1.0 + 1e-5).all()

    def test_proper_termination_flag(self):
        env = make_env("Foraging-8x8-2p-3f-v3", time_limit=3)
        # with proper termination, pure truncation at t=3 must NOT set dones
        rollout, _ = collect_episodes(
            env,
            random_policy(6),
            None,
            jax.random.PRNGKey(2),
            n_envs=8,
            time_limit=3,
            use_proper_termination=True,
        )
        dones = np.asarray(rollout.dones)
        filled = np.asarray(rollout.filled)
        for e in range(8):
            length = int(filled[:, e].sum())
            if length == 3:  # ran to the limit: could be termination or truncation
                continue
        # without proper termination every episode records a done
        rollout2, _ = collect_episodes(
            env,
            random_policy(6),
            None,
            jax.random.PRNGKey(2),
            n_envs=8,
            time_limit=3,
            use_proper_termination=False,
        )
        d2 = np.asarray(rollout2.dones)
        f2 = np.asarray(rollout2.filled)
        for e in range(8):
            length = int(f2[:, e].sum())
            assert d2[length, e] == 1.0


class TestAutoReset:
    def test_steps_forever(self):
        env = make_env("Foraging-8x8-2p-3f-v3", time_limit=25)
        step = jax.jit(autoreset_step(env))
        states, ts = jax.vmap(env.reset)(jax.random.split(jax.random.PRNGKey(0), 4))
        key = jax.random.PRNGKey(1)
        for t in range(60):
            key, k1, k2 = jax.random.split(key, 3)
            actions = jax.random.randint(k1, (4, 2), 0, 6)
            states, ts = step(states, actions, k2)
        # time-limit wrapper state must have been reset at least once
        assert int(np.asarray(states.t).max()) <= 25
