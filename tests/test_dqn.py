"""Tests for the DQN family: loss semantics, replay, training dynamics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from codebase_tpu.algos.dqn import DQNModel, build_train_functions
from codebase_tpu.config import load_config
from codebase_tpu.envs.factory import make_env
from codebase_tpu.envs.vector import collect_episodes
from codebase_tpu.ops.replay import replay_add, replay_init, replay_sample


def make_cfg(algo="idqn", **over):
    argv = [f"+algorithm={algo}"] + [f"{k}={v}" for k, v in over.items()]
    return load_config(argv)


class TestReplay:
    def _rollout(self, key, n_envs=4):
        env = make_env("Foraging-8x8-2p-3f-v3", time_limit=25)
        return collect_episodes(
            env,
            lambda c, o, m, k: (c, jax.random.randint(k, o.shape[:2], 0, 6)),
            None,
            key,
            n_envs,
            25,
        )[0]

    def test_add_and_sample_roundtrip(self):
        buf = replay_init(16, 25, 2, 15, 6)
        r = self._rollout(jax.random.PRNGKey(0))
        buf = replay_add(buf, r)
        assert int(buf.pos) == 4
        assert not bool(buf.can_sample(8))
        buf = replay_add(buf, self._rollout(jax.random.PRNGKey(1)))
        assert bool(buf.can_sample(8))
        batch = replay_sample(buf, jax.random.PRNGKey(2), 8)
        assert batch["obss"].shape == (2, 26, 8, 15)
        assert batch["actions"].shape == (2, 25, 8)
        assert batch["dones"].shape == (26, 8)
        # episode-0 content must round-trip exactly
        np.testing.assert_allclose(
            np.asarray(buf.obs[0]), np.asarray(jnp.moveaxis(r.obs, 1, 0)[0])
        )

    def test_ring_wraparound(self):
        buf = replay_init(6, 25, 2, 15, 6)
        for i in range(3):
            buf = replay_add(buf, self._rollout(jax.random.PRNGKey(i)))
        assert int(buf.pos) == 12
        assert int(buf.num_stored) == 6

    @staticmethod
    def _manual_rollout(lengths, T, value):
        """One-env-per-length rollouts filled with `value` for slot-reuse
        tests: episode e has `lengths[e]` steps, zero-padded past its end
        (exactly what `collect_episodes` produces)."""
        from codebase_tpu.envs.vector import Rollout

        E = len(lengths)
        t = np.arange(T)
        filled = (t[:, None] < np.array(lengths)[None, :]).astype(np.float32)
        dones = np.zeros((T + 1, E), np.float32)
        dones[np.array(lengths), np.arange(E)] = 1.0
        obs_written = np.concatenate([np.ones((1, E), np.float32), filled])
        return Rollout(
            obs=jnp.asarray(value * obs_written[:, :, None, None] * np.ones((T + 1, E, 1, 1), np.float32)),
            actions=jnp.asarray((value * filled).astype(np.int32)[:, :, None]),
            rewards=jnp.asarray(value * filled[:, :, None]),
            stat_rewards=jnp.asarray(value * filled[:, :, None]),
            dones=jnp.asarray(dones),
            filled=jnp.asarray(filled),
            action_mask=jnp.ones((T + 1, E, 1, 3), jnp.float32),
        )

    def test_slot_reuse_keeps_stale_tails_like_reference(self):
        """The reference ring buffer never clears a reused slot
        (`dqn/train.py:66-89`: `init_episode`/`add` write only the new
        episode's indices), so a shorter episode keeps the previous
        occupant's tail — filled flags included. Round-3 gate diagnosis
        showed this quirk is load-bearing for learning-curve parity; pin it."""
        T = 5
        buf = replay_init(1, T, 1, 1, 3, with_mask=False)
        long = self._manual_rollout([5], T, value=7.0)
        short = self._manual_rollout([2], T, value=3.0)

        ref = replay_add(replay_add(buf, long), short, "reference")
        # steps 0-1 are the new episode; steps 2-4 are the stale tail of the
        # 5-step occupant, with filled still True (the reference quirk)
        np.testing.assert_allclose(np.asarray(ref.filled[0]), [1, 1, 1, 1, 1])
        np.testing.assert_allclose(np.asarray(ref.rewards[0, :, 0]), [3, 3, 7, 7, 7])
        # obs index 0..len written by the new episode, the rest stale
        np.testing.assert_allclose(np.asarray(ref.obs[0, :, 0, 0]), [3, 3, 3, 7, 7, 7])
        # dones: new episode's done at index len, stale done at index 5
        np.testing.assert_allclose(np.asarray(ref.dones[0]), [0, 0, 1, 0, 0, 1])

        clean = replay_add(replay_add(buf, long), short, "clear")
        np.testing.assert_allclose(np.asarray(clean.filled[0]), [1, 1, 0, 0, 0])
        np.testing.assert_allclose(np.asarray(clean.rewards[0, :, 0]), [3, 3, 0, 0, 0])


class TestLossSemantics:
    """Check the TD math against a numpy transcription of
    `dqn/model.py:118-163` driven by the same network outputs."""

    def _setup(self, mixer="none", double_q=True):
        env = make_env("Foraging-8x8-2p-2f-v3", time_limit=6)
        cfg = make_cfg()
        model_cfg = cfg.algorithm.model
        if mixer == "vdn":
            model_cfg.name = "vdn"
        elif mixer == "qmix":
            cfg = make_cfg("qmix")
            model_cfg = cfg.algorithm.model
        cfg.algorithm.double_q = double_q
        model = DQNModel.create(env, model_cfg, cfg.algorithm)
        params = model.init_params(jax.random.PRNGKey(0))
        target = model.init_params(jax.random.PRNGKey(1))
        rollout, _ = collect_episodes(
            env,
            lambda c, o, m, k: (c, jax.random.randint(k, o.shape[:2], 0, 6)),
            None,
            jax.random.PRNGKey(2),
            5,
            6,
        )
        buf = replay_add(replay_init(8, 6, 2, env.obs_dim, 6), rollout)
        batch = replay_sample(buf, jax.random.PRNGKey(3), 4)
        return env, model, params, target, batch

    def test_idqn_matches_numpy_oracle(self):
        env, model, params, target, batch = self._setup()
        loss, _ = model.loss(params, target, batch, model.init_rms())

        q, _ = model.critic.apply(params["critic"], batch["obss"])
        tq, _ = model.critic.apply(target["critic"], batch["obss"])
        q, tq = np.asarray(q), np.asarray(tq)
        actions = np.asarray(batch["actions"])
        chosen = np.take_along_axis(q[:, :-1], actions[..., None], -1)[..., 0]
        a_prime = q[:, 1:].argmax(-1)
        tgt = np.take_along_axis(tq[:, 1:], a_prime[..., None], -1)[..., 0]
        dones = np.asarray(batch["dones"])[1:][None]
        returns = np.asarray(batch["rewards"]) + 0.99 * tgt * (1 - dones)
        filled = np.asarray(batch["filled"])
        expected = (((chosen - returns) ** 2).sum(0) * filled).sum() / filled.sum()
        np.testing.assert_allclose(float(loss), expected, rtol=1e-4)

    def test_vdn_sums_agent_utilities(self):
        env, model, params, target, batch = self._setup("vdn")
        loss, _ = model.loss(params, target, batch, model.init_rms())

        q, _ = model.critic.apply(params["critic"], batch["obss"])
        tq, _ = model.critic.apply(target["critic"], batch["obss"])
        q, tq = np.asarray(q), np.asarray(tq)
        actions = np.asarray(batch["actions"])
        chosen = np.take_along_axis(q[:, :-1], actions[..., None], -1)[..., 0].sum(0)
        a_prime = q[:, 1:].argmax(-1)
        tgt = np.take_along_axis(tq[:, 1:], a_prime[..., None], -1)[..., 0].sum(0)
        dones = np.asarray(batch["dones"])[1:]
        returns = np.asarray(batch["rewards"])[0] + 0.99 * tgt * (1 - dones)
        filled = np.asarray(batch["filled"])
        expected = (((chosen - returns) ** 2) * filled).sum() / filled.sum()
        np.testing.assert_allclose(float(loss), expected, rtol=1e-4)

    def test_qmix_runs_and_differs_from_vdn(self):
        env, model, params, target, batch = self._setup("qmix")
        loss, _ = model.loss(params, target, batch, model.init_rms())
        assert np.isfinite(float(loss))
        assert "mixer" in params

    def test_single_q_max_target(self):
        env, model, params, target, batch = self._setup(double_q=False)
        loss, _ = model.loss(params, target, batch, model.init_rms())
        q, _ = model.critic.apply(params["critic"], batch["obss"])
        tq, _ = model.critic.apply(target["critic"], batch["obss"])
        q, tq = np.asarray(q), np.asarray(tq)
        actions = np.asarray(batch["actions"])
        chosen = np.take_along_axis(q[:, :-1], actions[..., None], -1)[..., 0]
        tgt = tq[:, 1:].max(-1)
        dones = np.asarray(batch["dones"])[1:][None]
        returns = np.asarray(batch["rewards"]) + 0.99 * tgt * (1 - dones)
        filled = np.asarray(batch["filled"])
        expected = (((chosen - returns) ** 2).sum(0) * filled).sum() / filled.sum()
        np.testing.assert_allclose(float(loss), expected, rtol=1e-4)


class TestPolicy:
    def test_epsilon_zero_is_greedy(self):
        env = make_env("Foraging-8x8-2p-3f-v3", time_limit=25)
        cfg = make_cfg()
        model = DQNModel.create(env, cfg.algorithm.model, cfg.algorithm)
        params = model.init_params(jax.random.PRNGKey(0))
        policy = model.policy(params, 0.0)
        obs = jax.random.normal(jax.random.PRNGKey(1), (8, 2, 15))
        mask = jnp.ones((8, 2, 6))
        _, a1 = policy(None, obs, mask, jax.random.PRNGKey(2))
        _, a2 = policy(None, obs, mask, jax.random.PRNGKey(3))
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))

    def test_epsilon_one_is_random(self):
        env = make_env("Foraging-8x8-2p-3f-v3", time_limit=25)
        cfg = make_cfg()
        model = DQNModel.create(env, cfg.algorithm.model, cfg.algorithm)
        params = model.init_params(jax.random.PRNGKey(0))
        policy = model.policy(params, 1.0)
        obs = jnp.zeros((256, 2, 15))
        mask = jnp.ones((256, 2, 6))
        _, a = policy(None, obs, mask, jax.random.PRNGKey(2))
        # all 6 actions appear under full exploration
        assert len(np.unique(np.asarray(a))) == 6


class TestEndToEnd:
    def test_idqn_learns_matrix_coordination(self):
        """IDQN must learn the (0, 0) joint optimum of the coordination
        game — the fast analogue of the lbforaging learning-curve gate."""
        env = make_env("matrix-coordination", time_limit=1)
        cfg = make_cfg(
            "idqn",
            **{
                "algorithm.total_steps": 3000,
                "algorithm.training_start": 64,
                "algorithm.buffer_size": 512,
                "algorithm.batch_size": 32,
                "algorithm.lr": 5e-3,
                "algorithm.target_update_interval_or_tau": 25,
                "algorithm.eps_decay_over": 0.4,
            },
        )
        cfg.algorithm.parallel_envs = 16
        model, init_state, train_chunk, evaluate = build_train_functions(
            env, env, cfg.algorithm, time_limit=1
        )
        state = init_state(jax.random.PRNGKey(0))
        for _ in range(12):
            state, metrics = train_chunk(state, 16)
        out = evaluate(state.params, jax.random.PRNGKey(1))
        mean_return = float(np.asarray(out["episode_returns"]).sum(-1).mean())
        # optimal joint return = 1.0 per agent -> sum 2.0; eps_eval=0.05 noise
        assert mean_return > 1.6, f"IDQN failed to learn coordination: {mean_return}"

    def test_train_chunk_runs_lbf(self):
        env = make_env("Foraging-8x8-2p-3f-v3", time_limit=25)
        cfg = make_cfg("idqn", **{"algorithm.total_steps": 10000})
        cfg.algorithm.parallel_envs = 8
        model, init_state, train_chunk, evaluate = build_train_functions(
            env, env, cfg.algorithm, time_limit=25
        )
        state = init_state(jax.random.PRNGKey(0))
        state, metrics = train_chunk(state, 3)
        assert int(state.env_steps) > 0
        assert metrics["episode_returns"].shape == (3, 8, 2)


class TestReplayDtype:
    def test_bf16_default_for_integer_obs_envs(self):
        from codebase_tpu.algos.dqn import build_train_functions
        import jax.numpy as jnp

        env = make_env("Foraging-8x8-2p-3f-v3", time_limit=6)
        cfg = make_cfg()
        cfg.algorithm.parallel_envs = 2
        _, init_state, _, _ = build_train_functions(env, env, cfg.algorithm, 6)
        st = init_state(jax.random.PRNGKey(0))
        assert st.buffer.obs.dtype == jnp.bfloat16
        assert st.buffer.action_mask is None  # maskless env

    def test_f32_default_for_fractional_obs_envs(self):
        from codebase_tpu.algos.dqn import build_train_functions
        import jax.numpy as jnp

        env = make_env("smaclite:2m-v0", time_limit=6)
        cfg = make_cfg()
        cfg.algorithm.parallel_envs = 2
        _, init_state, _, _ = build_train_functions(env, env, cfg.algorithm, 6)
        st = init_state(jax.random.PRNGKey(0))
        assert st.buffer.obs.dtype == jnp.float32  # hp fractions not bf16-exact
        assert st.buffer.action_mask is not None
        assert st.buffer.action_mask.dtype == jnp.float32
