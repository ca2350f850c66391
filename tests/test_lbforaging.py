"""Invariant tests for the pure-JAX Level-Based Foraging environment."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from codebase_tpu.envs.lbforaging import (
    EAST,
    LOAD,
    NONE,
    NORTH,
    SOUTH,
    WEST,
    LBFState,
    LevelBasedForaging,
    parse_lbf_name,
)


ENV = LevelBasedForaging(rows=8, cols=8, num_agents=2, max_food=3, sight=8)


def manual_state(agent_pos, agent_level, food_pos, food_level, food_active, t=0):
    fl = jnp.asarray(food_level, jnp.int32) * jnp.asarray(food_active)
    return LBFState(
        agent_pos=jnp.asarray(agent_pos, jnp.int32),
        agent_level=jnp.asarray(agent_level, jnp.int32),
        food_pos=jnp.asarray(food_pos, jnp.int32),
        food_level=fl,
        food_active=jnp.asarray(food_active),
        food_spawned=jnp.sum(fl).astype(jnp.float32),
        t=jnp.asarray(t, jnp.int32),
    )


class TestNameParsing:
    def test_standard(self):
        env = parse_lbf_name("lbforaging:Foraging-8x8-2p-3f-v3")
        assert (env.rows, env.cols, env.num_agents, env.max_food) == (8, 8, 2, 3)
        assert not env.force_coop
        assert env.sight == 8

    def test_coop_and_sight(self):
        env = parse_lbf_name("Foraging-2s-10x10-3p-3f-coop-v3")
        assert env.force_coop and env.sight == 2
        assert (env.num_agents, env.max_food) == (3, 3)


class TestReset:
    def test_spawn_invariants(self):
        keys = jax.random.split(jax.random.PRNGKey(0), 64)
        states, ts = jax.vmap(ENV.reset)(keys)
        pos = np.asarray(states.agent_pos)
        fpos = np.asarray(states.food_pos)
        active = np.asarray(states.food_active)
        lvl = np.asarray(states.agent_level)
        flvl = np.asarray(states.food_level)
        for e in range(64):
            # players on distinct cells
            cells = {tuple(p) for p in pos[e]}
            assert len(cells) == ENV.num_agents
            # all 3 foods placed on this easy board
            assert active[e].all()
            for f in range(ENV.max_food):
                r, c = fpos[e, f]
                # interior
                assert 1 <= r <= ENV.rows - 2 and 1 <= c <= ENV.cols - 2
                # not on a player
                assert (r, c) not in cells
                # no food adjacency (Chebyshev > 1 between active foods)
                for g in range(f + 1, ENV.max_food):
                    r2, c2 = fpos[e, g]
                    assert max(abs(int(r) - int(r2)), abs(int(c) - int(c2))) > 1
            assert ((1 <= lvl[e]) & (lvl[e] <= 3)).all()
            # food level below sum of three lowest player levels (exclusive)
            assert (flvl[e][active[e]] < lvl[e].sum() + 1).all()
            assert (flvl[e][active[e]] >= 1).all()
        # observation shape
        assert ts.obs.shape == (64, 2, ENV.obs_dim)

    def test_coop_levels(self):
        env = LevelBasedForaging(rows=8, cols=8, num_agents=2, max_food=2, sight=8, force_coop=True)
        states, _ = jax.vmap(env.reset)(jax.random.split(jax.random.PRNGKey(1), 16))
        lvl_sum = np.asarray(states.agent_level).sum(-1)
        flvl = np.asarray(states.food_level)
        active = np.asarray(states.food_active)
        for e in range(16):
            assert (flvl[e][active[e]] == lvl_sum[e]).all()


class TestStep:
    def test_movement_and_bounds(self):
        state = manual_state(
            agent_pos=[[0, 0], [7, 7]],
            agent_level=[1, 1],
            food_pos=[[4, 4], [2, 2], [6, 2]],
            food_level=[1, 1, 1],
            food_active=[True, True, True],
        )
        key = jax.random.PRNGKey(0)
        # agent0 NORTH off-board -> stays; agent1 EAST off-board -> stays
        s2, ts = ENV.step(state, jnp.asarray([NORTH, EAST]), key)
        np.testing.assert_array_equal(np.asarray(s2.agent_pos), [[0, 0], [7, 7]])
        # agent0 SOUTH -> (1,0); agent1 WEST -> (7,6)
        s3, _ = ENV.step(state, jnp.asarray([SOUTH, WEST]), key)
        np.testing.assert_array_equal(np.asarray(s3.agent_pos), [[1, 0], [7, 6]])

    def test_move_onto_food_blocked(self):
        state = manual_state(
            agent_pos=[[4, 3], [0, 0]],
            agent_level=[1, 1],
            food_pos=[[4, 4], [2, 2], [6, 6]],
            food_level=[1, 1, 1],
            food_active=[True, True, True],
        )
        s2, _ = ENV.step(state, jnp.asarray([EAST, NONE]), jax.random.PRNGKey(0))
        np.testing.assert_array_equal(np.asarray(s2.agent_pos)[0], [4, 3])

    def test_collision_cancels_both(self):
        state = manual_state(
            agent_pos=[[3, 2], [3, 4]],
            agent_level=[1, 1],
            food_pos=[[6, 6], [1, 1], [1, 6]],
            food_level=[1, 1, 1],
            food_active=[True, True, True],
        )
        s2, _ = ENV.step(state, jnp.asarray([EAST, WEST]), jax.random.PRNGKey(0))
        np.testing.assert_array_equal(np.asarray(s2.agent_pos), [[3, 2], [3, 4]])

    def test_move_onto_stationary_agent_blocked(self):
        state = manual_state(
            agent_pos=[[3, 2], [3, 3]],
            agent_level=[1, 1],
            food_pos=[[6, 6], [1, 1], [1, 6]],
            food_level=[1, 1, 1],
            food_active=[True, True, True],
        )
        s2, _ = ENV.step(state, jnp.asarray([EAST, NONE]), jax.random.PRNGKey(0))
        np.testing.assert_array_equal(np.asarray(s2.agent_pos), [[3, 2], [3, 3]])

    def test_solo_load_success_and_reward(self):
        state = manual_state(
            agent_pos=[[4, 3], [0, 0]],
            agent_level=[2, 1],
            food_pos=[[4, 4], [2, 2], [6, 6]],
            food_level=[2, 1, 1],
            food_active=[True, True, True],
        )
        s2, ts = ENV.step(state, jnp.asarray([LOAD, NONE]), jax.random.PRNGKey(0))
        active = np.asarray(s2.food_active)
        assert not active[0] and active[1] and active[2]
        # reward = level*food / (loader_sum * food_spawned) = 2*2 / (2*4)
        np.testing.assert_allclose(np.asarray(ts.reward), [4 / 8, 0.0], atol=1e-6)
        assert not bool(ts.terminated)

    def test_cooperative_load(self):
        state = manual_state(
            agent_pos=[[4, 3], [3, 4]],
            agent_level=[1, 1],
            food_pos=[[4, 4], [1, 1], [6, 6]],
            food_level=[2, 1, 1],
            food_active=[True, True, True],
        )
        s2, ts = ENV.step(state, jnp.asarray([LOAD, LOAD]), jax.random.PRNGKey(0))
        assert not np.asarray(s2.food_active)[0]
        # each: level*food/(sum*spawned) = 1*2/(2*4) = 0.25
        np.testing.assert_allclose(np.asarray(ts.reward), [0.25, 0.25], atol=1e-6)

    def test_failed_load_when_underlevel(self):
        state = manual_state(
            agent_pos=[[4, 3], [0, 0]],
            agent_level=[1, 1],
            food_pos=[[4, 4], [2, 2], [6, 6]],
            food_level=[3, 1, 1],
            food_active=[True, True, True],
        )
        s2, ts = ENV.step(state, jnp.asarray([LOAD, NONE]), jax.random.PRNGKey(0))
        assert np.asarray(s2.food_active)[0]
        np.testing.assert_allclose(np.asarray(ts.reward), [0.0, 0.0])

    def test_termination_on_all_food_collected(self):
        state = manual_state(
            agent_pos=[[4, 3], [0, 0]],
            agent_level=[3, 1],
            food_pos=[[4, 4], [2, 2], [6, 6]],
            food_level=[2, 1, 1],
            food_active=[True, False, False],
        )
        s2, ts = ENV.step(state, jnp.asarray([LOAD, NONE]), jax.random.PRNGKey(0))
        assert bool(ts.terminated)

    def test_internal_step_limit_terminates(self):
        state = manual_state(
            agent_pos=[[4, 3], [0, 0]],
            agent_level=[1, 1],
            food_pos=[[4, 4], [2, 2], [6, 6]],
            food_level=[3, 2, 2],
            food_active=[True, True, True],
            t=ENV.max_episode_steps - 1,
        )
        _, ts = ENV.step(state, jnp.asarray([NONE, NONE]), jax.random.PRNGKey(0))
        assert bool(ts.terminated)


class TestObs:
    def test_full_sight_layout(self):
        state = manual_state(
            agent_pos=[[0, 1], [5, 5]],
            agent_level=[2, 1],
            food_pos=[[4, 4], [2, 2], [6, 6]],
            food_level=[1, 2, 3],
            food_active=[True, True, True],
        )
        obs = np.asarray(ENV._make_obs(state))
        assert obs.shape == (2, ENV.obs_dim)
        # foods in row-major order: (2,2,2), (4,4,1), (6,6,3)
        np.testing.assert_array_equal(obs[0][:9], [2, 2, 2, 4, 4, 1, 6, 6, 3])
        # both agents see the same full board
        np.testing.assert_array_equal(obs[0], obs[1])
        # players in index order
        np.testing.assert_array_equal(obs[0][9:], [0, 1, 2, 5, 5, 1])

    def test_eaten_food_compacts(self):
        state = manual_state(
            agent_pos=[[0, 1], [5, 5]],
            agent_level=[2, 1],
            food_pos=[[4, 4], [2, 2], [6, 6]],
            food_level=[1, 2, 3],
            food_active=[True, False, True],
        )
        obs = np.asarray(ENV._make_obs(state))
        np.testing.assert_array_equal(obs[0][:9], [4, 4, 1, 6, 6, 3, -1, -1, 0])

    def test_partial_sight_masks_and_relative_coords(self):
        env = LevelBasedForaging(rows=8, cols=8, num_agents=2, max_food=2, sight=2)
        state = manual_state(
            agent_pos=[[4, 4], [0, 0]],
            agent_level=[1, 1],
            food_pos=[[4, 5], [1, 1]],
            food_level=[1, 1],
            food_active=[True, True],
        )
        obs = np.asarray(env._make_obs(state))
        # agent0 window origin = (2,2): sees food (4,5) at rel (2,3); food (1,1)
        # and agent1 are out of sight
        np.testing.assert_array_equal(obs[0][:6], [2, 3, 1, -1, -1, 0])
        np.testing.assert_array_equal(obs[0][6:], [2, 2, 1, -1, -1, 0])
        # agent1 window origin = (0,0): food (1,1) visible absolute
        np.testing.assert_array_equal(obs[1][:6], [1, 1, 1, -1, -1, 0])

    def test_jit_and_vmap_step(self):
        keys = jax.random.split(jax.random.PRNGKey(0), 32)
        states, ts = jax.vmap(ENV.reset)(keys)
        step = jax.jit(jax.vmap(ENV.step))
        actions = jax.random.randint(jax.random.PRNGKey(1), (32, 2), 0, 6)
        s2, ts2 = step(states, actions, jax.random.split(jax.random.PRNGKey(2), 32))
        assert ts2.obs.shape == (32, 2, ENV.obs_dim)
        assert bool(jnp.all(jnp.isfinite(ts2.obs)))


class TestGridObservations:
    """`Foraging-grid-*` ids: flattened (3, 2s+1, 2s+1) windows of
    [agent-levels, food-levels, access] layers (the original package's grid
    mode; reference users reach it via the same registered id scheme)."""

    def test_parser_variants(self):
        env = parse_lbf_name("Foraging-grid-8x8-2p-3f-v3")
        assert env.grid_obs and env.sight == 8
        env = parse_lbf_name("lbforaging:Foraging-grid-2s-10x10-3p-3f-coop-v3")
        assert env.grid_obs and env.sight == 2 and env.force_coop
        assert not parse_lbf_name("Foraging-8x8-2p-3f-v3").grid_obs

    def test_obs_dim(self):
        env = parse_lbf_name("Foraging-grid-2s-8x8-2p-3f-v3")
        w = 2 * 2 + 1
        assert env.obs_dim == 3 * w * w

    def test_layer_semantics(self):
        env = LevelBasedForaging(
            rows=5, cols=5, num_agents=2, max_food=2, sight=2, grid_obs=True
        )
        state = manual_state(
            agent_pos=[[2, 2], [0, 0]],
            agent_level=[2, 3],
            food_pos=[[2, 3], [4, 4]],
            food_level=[1, 2],
            food_active=[True, True],
        )
        w = 5
        obs = np.asarray(env._make_obs(state)).reshape(2, 3, w, w)
        agents0, foods0, access0 = obs[0]
        # window of agent0 at (2,2) with sight 2 covers the whole 5x5 field
        # and is fully in-bounds; centre is self
        assert agents0[2, 2] == 2.0  # self level
        assert agents0[0, 0] == 3.0  # agent1 at (0,0) rel (0,0)
        assert foods0[2, 3] == 1.0 and foods0[4, 4] == 2.0
        # access: 0 at agents and foods, 1 on free cells
        assert access0[2, 2] == 0 and access0[0, 0] == 0
        assert access0[2, 3] == 0 and access0[4, 4] == 0
        assert access0[1, 1] == 1
        # agent1 at (0,0): window extends out of bounds -> padding rows/cols
        agents1, foods1, access1 = obs[1]
        assert access1[:2, :].max() == 0 and access1[:, :2].max() == 0
        assert agents1[2, 2] == 3.0  # self at centre
        assert agents1[4, 4] == 2.0  # agent0 at rel (+2,+2)

    def test_dynamics_identical_to_flat_variant(self):
        flat = LevelBasedForaging(rows=6, cols=6, num_agents=2, max_food=2, sight=6)
        grid = LevelBasedForaging(
            rows=6, cols=6, num_agents=2, max_food=2, sight=6, grid_obs=True
        )
        key = jax.random.PRNGKey(5)
        s_f, _ = flat.reset(key)
        s_g, _ = grid.reset(key)
        for t in range(10):
            acts = jax.random.randint(jax.random.PRNGKey(t), (2,), 0, 6)
            k = jax.random.PRNGKey(100 + t)
            s_f, ts_f = flat.step(s_f, acts, k)
            s_g, ts_g = grid.step(s_g, acts, k)
            np.testing.assert_array_equal(
                np.asarray(s_f.agent_pos), np.asarray(s_g.agent_pos)
            )
            np.testing.assert_allclose(
                np.asarray(ts_f.reward), np.asarray(ts_g.reward)
            )

    def test_batched_fallback_matches_vmap(self):
        env = parse_lbf_name("Foraging-grid-2s-6x6-2p-2f-v3")
        key = jax.random.PRNGKey(0)
        bstate, ts = env.reset_batch(key, 8)
        assert ts.obs.shape == (8, 2, env.obs_dim)
        ref_state, ref_ts = jax.vmap(env.reset)(jax.random.split(key, 8))
        np.testing.assert_array_equal(np.asarray(ts.obs), np.asarray(ref_ts.obs))
        acts = jax.random.randint(jax.random.PRNGKey(1), (8, 2), 0, 6)
        k = jax.random.PRNGKey(2)
        _, ts2 = env.step_batch(bstate, acts, k)
        assert ts2.obs.shape == (8, 2, env.obs_dim)

    def test_trains_end_to_end(self):
        from codebase_tpu.algos.dqn import build_train_functions
        from codebase_tpu.config import load_config
        from codebase_tpu.envs.factory import make_env

        env = make_env("lbforaging:Foraging-grid-2s-5x5-2p-1f-v3", time_limit=5)
        cfg = load_config(
            ["+algorithm=idqn", "algorithm.parallel_envs=4",
             "algorithm.batch_size=2", "algorithm.buffer_size=16",
             "algorithm.training_start=0"]
        )
        _, init_state, train_chunk, _ = build_train_functions(
            env, env, cfg.algorithm, 5
        )
        state = init_state(jax.random.PRNGKey(0))
        state, metrics = train_chunk(state, 2)
        assert int(state.env_steps) > 0
