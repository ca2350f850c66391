"""Tests for the SMAC-style combat env and mask plumbing end-to-end."""

import numpy as np
import jax
import jax.numpy as jnp

from codebase_tpu.envs.smaclite import CombatState, SmacLiteCombat, parse_smaclite_name
from codebase_tpu.envs.factory import make_env


def mk_state(env, ally_pos, enemy_pos, ally_hp=None, enemy_hp=None):
    return CombatState(
        ally_pos=jnp.asarray(ally_pos, jnp.int32),
        ally_hp=jnp.asarray(
            ally_hp if ally_hp is not None else env._stats(env.a_types, 0), jnp.float32
        ),
        ally_cd=jnp.zeros((env.n_agents,), jnp.int32),
        enemy_pos=jnp.asarray(enemy_pos, jnp.int32),
        enemy_hp=jnp.asarray(
            enemy_hp if enemy_hp is not None else env._stats(env.e_types, 0), jnp.float32
        ),
        enemy_cd=jnp.zeros((len(env.e_types),), jnp.int32),
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


class TestUnitTypes:
    """Mixed-unit scenarios: 2s3z/3s5z/MMM parsing, type bits, per-type
    stats, and medivac heal semantics."""

    def test_parse_mixed_scenarios(self):
        env = parse_smaclite_name("smaclite:2s3z-v0")
        assert env.a_types == ("stalker",) * 2 + ("zealot",) * 3
        assert env.e_types == env.a_types
        assert env.type_bits == 2
        env = parse_smaclite_name("smaclite:3s5z_vs_3s6z-v0")
        assert (env.n_allies, env.n_enemies) == (8, 9)
        env = parse_smaclite_name("smaclite:MMM-v0")
        assert env.a_types.count("medivac") == 1
        assert env.a_types.count("marauder") == 2
        assert env.a_types.count("marine") == 7
        env2 = parse_smaclite_name("smaclite:MMM2-v0")
        assert (env2.n_allies, env2.n_enemies) == (10, 12)

    def test_homogeneous_has_no_type_bits(self):
        env = parse_smaclite_name("smaclite:3m-v0")
        assert env.type_bits == 0
        # obs_dim unchanged from the marine-only layout
        assert env.obs_dim == 4 + 3 * 5 + 2 * 4

    def test_mixed_obs_dim_and_reset(self):
        env = parse_smaclite_name("smaclite:2s3z-v0")
        tb = env.type_bits
        assert env.obs_dim == (4 + tb) + 5 * (5 + tb) + 4 * (4 + tb)
        state, ts = env.reset(jax.random.PRNGKey(0))
        assert ts.obs.shape == (5, env.obs_dim)
        # per-type starting hp: stalkers 160, zealots 150
        np.testing.assert_allclose(
            np.asarray(state.ally_hp), [160.0, 160.0, 150.0, 150.0, 150.0]
        )

    def test_medivac_heals_ally(self):
        env = SmacLiteCombat(
            n_allies=2,
            n_enemies=1,
            ally_types=("medivac", "marine"),
            enemy_types=("marine",),
            rows=8,
            cols=8,
        )
        # marine damaged, enemy far away; medivac adjacent
        s = mk_state(
            env, [[0, 0], [0, 1]], [[7, 7]], ally_hp=[150.0, 20.0]
        )
        mask = np.asarray(env.avail_actions(s))
        # medivac (agent 0): heal slot for ally 1 (6+1) valid, self-heal invalid
        assert mask[0, 7] == 1 and mask[0, 6] == 0
        # marine (agent 1): enemy out of range -> attack slot 6 invalid
        assert mask[1, 6] == 0
        s2, ts = env.step(s, jnp.asarray([7, 1]), jax.random.PRNGKey(0))
        np.testing.assert_allclose(float(s2.ally_hp[1]), 20.0 + 9.0)  # smaclite ~9 hp/s heal
        # healing does not damage enemies or grant shaped reward
        np.testing.assert_allclose(float(s2.enemy_hp[0]), 45.0)
        np.testing.assert_allclose(float(ts.reward[0]), 0.0)

    def test_heal_cannot_resurrect_or_overheal(self):
        env = SmacLiteCombat(
            n_allies=2,
            n_enemies=1,
            ally_types=("medivac", "marine"),
            enemy_types=("marine",),
            rows=8,
            cols=8,
        )
        s = mk_state(env, [[0, 0], [0, 1]], [[7, 7]], ally_hp=[150.0, 0.0])
        mask = np.asarray(env.avail_actions(s))
        assert mask[0, 7] == 0  # dead ally not healable
        s = mk_state(env, [[0, 0], [0, 1]], [[7, 7]], ally_hp=[150.0, 40.0])
        s2, _ = env.step(s, jnp.asarray([7, 1]), jax.random.PRNGKey(0))
        assert float(s2.ally_hp[1]) == 45.0  # capped at marine max hp

    def test_mixed_scenario_trains_end_to_end(self):
        from codebase_tpu.envs.vector import collect_episodes

        env = make_env("smaclite:2s3z-v0", time_limit=12)

        def policy(carry, obs, mask, key):
            logits = jnp.where(mask > 0, 0.0, -jnp.inf)
            return carry, jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)

        rollout, _ = collect_episodes(env, policy, None, jax.random.PRNGKey(0), 8, 12)
        assert rollout.obs.shape == (13, 8, 5, env.obs_dim)
        # masked sampling only ever emits valid actions: no NOOP while alive
        acts = np.asarray(rollout.actions)
        filled = np.asarray(rollout.filled)
        # rewards are identical across agents (team scalar broadcast)
        rew = np.asarray(rollout.rewards)
        assert np.allclose(rew.min(-1), rew.max(-1), atol=1e-6)
        assert np.isfinite(np.asarray(rollout.episode_returns)).all()

    def test_killed_enemy_cannot_be_healed_same_step(self):
        """A unit killed this step (kill bonus granted) stays dead even with
        an adjacent ready enemy medivac (post-damage heal targeting)."""
        env = SmacLiteCombat(
            n_allies=1,
            n_enemies=2,
            ally_types=("marine",),
            enemy_types=("marine", "medivac"),
            rows=8,
            cols=8,
        )
        # enemy marine at 6hp next to its medivac; ally in range to kill it
        s = mk_state(env, [[0, 0]], [[0, 2], [0, 3]], enemy_hp=[6.0, 150.0])
        s2, ts = env.step(s, jnp.asarray([6]), jax.random.PRNGKey(0))
        assert float(s2.enemy_hp[0]) == 0.0  # dead, not resurrected
        # kill bonus granted exactly once
        expected = (6.0 + env.kill_bonus) / env.max_reward
        np.testing.assert_allclose(float(ts.reward[0]), expected, rtol=1e-5)

    def test_render_through_wrapper_stack(self):
        """render_frame unwraps stateless + stateful wrapper layers
        (recursive inner_state)."""
        env = make_env(
            "smaclite:2s3z-v0", time_limit=10, wrappers=["FlattenObservation"]
        )
        state, _ = env.reset(jax.random.PRNGKey(0))
        frame = env.render_frame(state)
        assert frame.ndim == 3 and frame.shape[-1] == 3
