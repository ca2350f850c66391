"""Tests for the SMAC-style combat env and mask plumbing end-to-end."""

import numpy as np
import jax
import jax.numpy as jnp

from codebase_tpu.envs.smaclite import CombatState, SmacLiteCombat, parse_smaclite_name
from codebase_tpu.envs.factory import make_env


def mk_state(env, ally_pos, enemy_pos, ally_hp=None, enemy_hp=None):
    N, M = env.n_allies, env.n_enemies
    return CombatState(
        ally_pos=jnp.asarray(ally_pos, jnp.int32),
        ally_hp=jnp.asarray(ally_hp if ally_hp is not None else [env.max_hp] * N, jnp.float32),
        ally_cd=jnp.zeros((N,), jnp.int32),
        enemy_pos=jnp.asarray(enemy_pos, jnp.int32),
        enemy_hp=jnp.asarray(enemy_hp if enemy_hp is not None else [env.max_hp] * M, jnp.float32),
        enemy_cd=jnp.zeros((M,), jnp.int32),
        t=jnp.asarray(0, jnp.int32),
    )


class TestParsing:
    def test_names(self):
        env = parse_smaclite_name("smaclite:5m_vs_6m-v0")
        assert (env.n_allies, env.n_enemies) == (5, 6)
        assert env.n_actions == 12
        env2 = parse_smaclite_name("smaclite:3m-v0")
        assert (env2.n_allies, env2.n_enemies) == (3, 3)
        assert make_env("smaclite:3m-v0", time_limit=50).has_action_mask


class TestMasks:
    ENV = SmacLiteCombat(n_allies=2, n_enemies=2, rows=8, cols=8, attack_range=2)

    def test_avail_actions(self):
        s = mk_state(self.ENV, [[0, 0], [4, 4]], [[0, 2], [7, 7]])
        mask = np.asarray(self.ENV.avail_actions(s))
        # agent0 at corner: noop invalid (alive), stop valid, north/west invalid
        assert mask[0, 0] == 0 and mask[0, 1] == 1
        assert mask[0, 2] == 0 and mask[0, 4] == 0  # N, W out of bounds
        assert mask[0, 3] == 1 and mask[0, 5] == 1  # S, E ok
        # enemy 0 at distance 2 -> attackable; enemy 1 far -> not
        assert mask[0, 6] == 1 and mask[0, 7] == 0

    def test_dead_agent_noop_only(self):
        s = mk_state(self.ENV, [[0, 0], [4, 4]], [[0, 2], [7, 7]], ally_hp=[0.0, 45.0])
        mask = np.asarray(self.ENV.avail_actions(s))
        assert mask[0, 0] == 1 and mask[0, 1:].sum() == 0


class TestCombat:
    ENV = SmacLiteCombat(n_allies=2, n_enemies=2, rows=8, cols=8, attack_range=2, damage=6.0)

    def test_attack_deals_damage_and_rewards(self):
        s = mk_state(self.ENV, [[0, 0], [0, 1]], [[0, 2], [7, 7]])
        s2, ts = self.ENV.step(s, jnp.asarray([6, 6]), jax.random.PRNGKey(0))
        np.testing.assert_allclose(float(s2.enemy_hp[0]), 45.0 - 12.0)
        expected = 12.0 / self.ENV.max_reward
        np.testing.assert_allclose(np.asarray(ts.reward), [expected, expected], rtol=1e-5)

    def test_kill_and_win_bonus(self):
        s = mk_state(
            self.ENV, [[0, 0], [0, 1]], [[0, 2], [7, 7]], enemy_hp=[5.0, 0.0]
        )
        s2, ts = self.ENV.step(s, jnp.asarray([6, 6]), jax.random.PRNGKey(0))
        assert bool(ts.terminated)  # all enemies dead -> win
        # damage capped at remaining hp (5) + kill 10 + win 200
        expected = (5.0 + 10.0 + 200.0) / self.ENV.max_reward
        np.testing.assert_allclose(np.asarray(ts.reward), [expected] * 2, rtol=1e-5)

    def test_enemy_ai_advances_and_shoots(self):
        env = SmacLiteCombat(n_allies=1, n_enemies=1, rows=8, cols=8, attack_range=1)
        s = mk_state(env, [[0, 0]], [[0, 5]])
        # out of range: enemy advances toward the ally
        s2, _ = env.step(s, jnp.asarray([1]), jax.random.PRNGKey(0))
        assert int(s2.enemy_pos[0, 1]) == 4
        # in range: enemy shoots
        s3 = mk_state(env, [[0, 0]], [[0, 1]])
        s4, _ = env.step(s3, jnp.asarray([1]), jax.random.PRNGKey(0))
        np.testing.assert_allclose(float(s4.ally_hp[0]), 45.0 - 6.0)

    def test_loss_terminates(self):
        env = SmacLiteCombat(n_allies=1, n_enemies=1, rows=8, cols=8, attack_range=1)
        s = mk_state(env, [[0, 0]], [[0, 1]], ally_hp=[3.0])
        _, ts = env.step(s, jnp.asarray([1]), jax.random.PRNGKey(0))
        assert bool(ts.terminated)


class TestMaskedTrainingE2E:
    def test_idqn_trains_with_masks(self):
        """Masks flow through rollout, replay, and the double-Q loss."""
        from codebase_tpu.algos.dqn import build_train_functions
        from codebase_tpu.config import load_config

        env = make_env("smaclite:2m-v0", time_limit=30)
        cfg = load_config(
            [
                "+algorithm=idqn",
                "algorithm.training_start=0",
                "algorithm.buffer_size=64",
                "algorithm.batch_size=8",
            ]
        )
        cfg.algorithm.parallel_envs = 4
        model, init_state, train_chunk, evaluate = build_train_functions(
            env, env, cfg.algorithm, time_limit=30
        )
        assert model.use_action_masks
        state = init_state(jax.random.PRNGKey(0))
        state, metrics = train_chunk(state, 2)
        assert int(state.updates) > 0
        losses = np.asarray(metrics["loss"])
        assert np.isfinite(losses[np.logical_not(np.isnan(losses))]).all()

    def test_mappo_trains_with_masks(self):
        from codebase_tpu.algos.ac import build_train_functions
        from codebase_tpu.config import load_config

        env = make_env("smaclite:2m-v0", time_limit=30)
        cfg = load_config(["+algorithm=mappo"])
        cfg.algorithm.parallel_envs = 4
        model, init_state, train_chunk, _ = build_train_functions(
            env, env, cfg.algorithm, time_limit=30
        )
        state = init_state(jax.random.PRNGKey(0))
        state, metrics = train_chunk(state, 2)
        assert np.isfinite(np.asarray(metrics["loss"])).all()
