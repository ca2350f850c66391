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
