"""Tests for the Gymnasium-facing adapter (`codebase_tpu/envs/gym_compat.py`).

The adapter exposes the functional JAX envs behind the reference's env
contract — Gymnasium API with tuple observations and per-agent reward lists
(`/root/reference/README.md:69`) — and a gym<1.0-semantics vector env with
same-step autoreset + `final_info` (`marlbase/ac/train.py:101-110`). These
tests pin that contract so the learning-gate harness (`scripts/ref_gate/`)
keeps working against unmodified reference training loops.
"""

import numpy as np
import pytest

gym = pytest.importorskip("gymnasium")

from codebase_tpu.envs import wrappers as W
from codebase_tpu.envs.factory import make_base_env
from codebase_tpu.envs.gym_compat import GymnasiumEnv, JaxVectorEnv, SyncVectorEnv

LBF = "lbforaging:Foraging-8x8-2p-3f-v3"
T = 25


def _lbf(limit=T):
    return W.TimeLimit(make_base_env(LBF), limit=limit)


class TestGymnasiumEnv:
    def test_reset_contract(self):
        env = GymnasiumEnv(_lbf(), seed=0)
        obs, info = env.reset()
        assert isinstance(obs, tuple) and len(obs) == 2
        for o, space in zip(obs, env.observation_space):
            assert o.shape == space.shape and o.dtype == np.float32
        assert env.unwrapped.n_agents == 2
        assert "action_mask" not in info  # LBF does not mask

    def test_step_contract_and_time_limit(self):
        env = GymnasiumEnv(_lbf(), seed=1)
        env.reset(seed=1)
        for t in range(1, T + 1):
            obs, rewards, terminated, truncated, info = env.step([0, 0])
            assert isinstance(rewards, list) and len(rewards) == 2
            assert isinstance(terminated, bool) and isinstance(truncated, bool)
            if t < T:
                assert not truncated
        # noop actions never terminate LBF, so the 25th step must truncate
        assert truncated and not terminated

    def test_seed_determinism(self):
        a = GymnasiumEnv(_lbf(), seed=3)
        b = GymnasiumEnv(_lbf(), seed=3)
        oa, _ = a.reset(seed=3)
        ob, _ = b.reset(seed=3)
        for x, y in zip(oa, ob):
            np.testing.assert_array_equal(x, y)
        for _ in range(5):
            sa = a.step([1, 2])
            sb = b.step([1, 2])
            for x, y in zip(sa[0], sb[0]):
                np.testing.assert_array_equal(x, y)
            assert sa[1] == sb[1]

    def test_action_mask_env(self):
        env_spec = W.TimeLimit(
            make_base_env("smaclite:3m-v0"), limit=30
        )
        env = GymnasiumEnv(env_spec, seed=0)
        obs, info = env.reset()
        assert "action_mask" in info
        mask = info["action_mask"]
        assert mask.shape == (env.n_agents, env_spec.n_actions)
        assert mask.min() >= 0.0 and mask.max() == 1.0


class TestJaxVectorEnv:
    def test_reset_shapes(self):
        envs = JaxVectorEnv(_lbf(), num_envs=4, seed=0)
        obs, info = envs.reset()
        assert len(obs) == 2
        assert obs[0].shape == (4, envs.single_observation_space[0].shape[0])
        assert envs.observation_space[0].shape[0] == 4

    def test_episode_stats_and_autoreset(self):
        envs = JaxVectorEnv(_lbf(limit=5), num_envs=3, seed=0)
        obs, _ = envs.reset()
        acc = np.zeros((3, 2), np.float32)
        agent_major = [[1] * 3, [2] * 3]
        for t in range(1, 6):
            obs, rewards, terminated, truncated, info = envs.step(agent_major)
            assert rewards.shape == (3, 2)
            done = np.logical_or(terminated, truncated)
            acc += rewards
            if t < 5:
                assert not done.any()
        # all three envs hit the 5-step limit simultaneously
        assert done.all()
        assert "final_info" in info and "final_observation" in info
        for j in range(3):
            fi = info["final_info"][j]
            assert fi is not None
            np.testing.assert_allclose(fi["episode_returns"], acc[j], rtol=1e-6)
            assert fi["episode_length"] == 5
            assert "agent0/episode_returns" in fi
            # final_observation is the pre-reset obs; the returned obs is the
            # fresh-reset obs of a new episode
            assert isinstance(info["final_observation"][j], tuple)
        # next step continues from the autoreset state without error
        obs2, _, term2, trunc2, _ = envs.step(agent_major)
        assert not np.logical_or(term2, trunc2).any()

    def test_reward_matches_single_env_semantics(self):
        # a vector of 1 env and a single env with the same key stream agree
        envs = JaxVectorEnv(_lbf(), num_envs=1, seed=7)
        envs.reset()
        total_v = np.zeros(2, np.float32)
        for _ in range(T):
            _, r, te, tr, _ = envs.step([[3], [4]])
            total_v += r[0]
        assert np.logical_or(te, tr).all()


class TestSyncVectorEnv:
    def test_final_info_and_autoreset(self):
        def thunk(seed):
            def _f():
                env = GymnasiumEnv(_lbf(limit=4), seed=seed)
                env.reset(seed=seed)
                return env

            return _f

        envs = SyncVectorEnv([thunk(i) for i in range(2)])
        obs, info = envs.reset()
        assert obs[0].shape == (2, envs.single_observation_space[0].shape[0])
        for t in range(1, 5):
            obs, rewards, terminated, truncated, info = envs.step(
                [[0, 0], [0, 0]]
            )
        assert truncated.all()
        assert "final_info" in info
        assert all(fi is not None for fi in info["final_info"])
        # stepping again works on the autoreset envs
        envs.step([[0, 0], [0, 0]])
