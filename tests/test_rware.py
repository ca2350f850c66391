"""Invariant tests for the pure-JAX RWARE environment."""

import numpy as np
import jax
import jax.numpy as jnp

from codebase_tpu.envs.rware import (
    FORWARD,
    LEFT,
    NOOP,
    RIGHT,
    TOGGLE_LOAD,
    RWARE,
    RWAREState,
    parse_rware_name,
)


def make_state(env, agent_pos, agent_dir, carrying=None, requested_ids=()):
    S = env.n_shelves
    requested = np.zeros(S, bool)
    for i in requested_ids:
        requested[i] = True
    carrying = carrying if carrying is not None else [-1] * env.num_agents
    shelf_carried = np.zeros(S, bool)
    shelf_loc = env._storage_locations().copy()
    for a, s in enumerate(carrying):
        if s >= 0:
            shelf_carried[s] = True
            shelf_loc[s] = agent_pos[a]
    return RWAREState(
        agent_pos=jnp.asarray(agent_pos, jnp.int32),
        agent_dir=jnp.asarray(agent_dir, jnp.int32),
        carrying=jnp.asarray(carrying, jnp.int32),
        shelf_loc=jnp.asarray(shelf_loc),
        shelf_carried=jnp.asarray(shelf_carried),
        requested=jnp.asarray(requested),
        t=jnp.asarray(0, jnp.int32),
    )


class TestGeometry:
    def test_tiny_dimensions(self):
        env = parse_rware_name("rware:rware-tiny-2ag-v2")
        assert (env.rows, env.cols) == (11, 10)
        assert env.n_shelves == 48
        assert env.obs_dim == 71
        assert env.request_queue_size == 2
        assert env.n_actions == 5

    def test_variants(self):
        assert parse_rware_name("rware-small-4ag-easy-v2").request_queue_size == 8
        assert parse_rware_name("rware-medium-4ag-hard-v2").request_queue_size == 2
        env = parse_rware_name("rware-large-8ag-v2")
        assert (env.shelf_rows, env.shelf_columns, env.num_agents) == (3, 5, 8)

    def test_storage_and_goals(self):
        env = RWARE()
        g = env._storage_grid()
        # highways at column multiples of 3 and first/last rows
        assert not g[:, 0].any() and not g[:, 3].any() and not g[:, 9].any()
        assert not g[0].any() and not g[-1].any() and not g[-2].any()
        assert g[1:9, 1:3].all()
        goals = env._goal_cells()
        np.testing.assert_array_equal(goals, [[10, 4], [10, 5]])


class TestReset:
    def test_invariants(self):
        env = parse_rware_name("rware-tiny-2ag-v2")
        states, ts = jax.vmap(env.reset)(jax.random.split(jax.random.PRNGKey(0), 32))
        assert ts.obs.shape == (32, 2, 71)
        req = np.asarray(states.requested)
        assert (req.sum(-1) == 2).all()
        carr = np.asarray(states.carrying)
        assert (carr == -1).all()
        pos = np.asarray(states.agent_pos)
        for e in range(32):
            assert len({tuple(p) for p in pos[e]}) == 2  # distinct spawn cells


class TestMovement:
    ENV = parse_rware_name("rware-tiny-2ag-v2")

    def test_rotation(self):
        s = make_state(self.ENV, [[0, 0], [10, 9]], [0, 3])
        s2, _ = self.ENV.step(s, jnp.asarray([LEFT, RIGHT]), jax.random.PRNGKey(0))
        # up->left ; right->down
        np.testing.assert_array_equal(np.asarray(s2.agent_dir), [2, 1])
        np.testing.assert_array_equal(np.asarray(s2.agent_pos), np.asarray(s.agent_pos))

    def test_forward_and_bounds(self):
        s = make_state(self.ENV, [[0, 0], [0, 3]], [0, 1])  # up at top row; down
        s2, _ = self.ENV.step(s, jnp.asarray([FORWARD, FORWARD]), jax.random.PRNGKey(0))
        np.testing.assert_array_equal(np.asarray(s2.agent_pos), [[0, 0], [1, 3]])

    def test_unloaded_passes_under_shelves_loaded_blocked(self):
        # shelf cells start at (1,1); agent at (0,1) facing down
        s = make_state(self.ENV, [[0, 1], [0, 2]], [1, 1], carrying=[-1, 0])
        # agent1 carries shelf 0; cell below agent1 is (1,2) which holds a stored shelf
        s2, _ = self.ENV.step(s, jnp.asarray([FORWARD, FORWARD]), jax.random.PRNGKey(0))
        np.testing.assert_array_equal(np.asarray(s2.agent_pos)[0], [1, 1])  # unloaded moves under
        np.testing.assert_array_equal(np.asarray(s2.agent_pos)[1], [0, 2])  # loaded blocked

    def test_chain_moves_and_blocked_chain(self):
        env = self.ENV
        # two agents in a row on the highway, both moving right: chain moves
        s = make_state(env, [[0, 0], [0, 1]], [3, 3])
        s2, _ = env.step(s, jnp.asarray([FORWARD, FORWARD]), jax.random.PRNGKey(0))
        np.testing.assert_array_equal(np.asarray(s2.agent_pos), [[0, 1], [0, 2]])
        # front agent stationary: follower blocked
        s3, _ = env.step(s, jnp.asarray([FORWARD, NOOP]), jax.random.PRNGKey(0))
        np.testing.assert_array_equal(np.asarray(s3.agent_pos), [[0, 0], [0, 1]])

    def test_contention_lowest_index_wins(self):
        # both target (0,1)
        s = make_state(self.ENV, [[0, 0], [0, 2]], [3, 2])  # right / left
        s2, _ = self.ENV.step(s, jnp.asarray([FORWARD, FORWARD]), jax.random.PRNGKey(0))
        np.testing.assert_array_equal(np.asarray(s2.agent_pos), [[0, 1], [0, 2]])


class TestLoadDeliver:
    ENV = parse_rware_name("rware-tiny-2ag-v2")

    def test_pickup_and_putdown(self):
        env = self.ENV
        # shelf 0 is at storage cell (1,1)
        s = make_state(env, [[1, 1], [0, 9]], [0, 0])
        s2, _ = env.step(s, jnp.asarray([TOGGLE_LOAD, NOOP]), jax.random.PRNGKey(0))
        assert int(s2.carrying[0]) == 0
        assert bool(s2.shelf_carried[0])
        # put it back down on the same storage cell
        s3, _ = env.step(s2, jnp.asarray([TOGGLE_LOAD, NOOP]), jax.random.PRNGKey(0))
        assert int(s3.carrying[0]) == -1
        assert not bool(s3.shelf_carried[0])
        np.testing.assert_array_equal(np.asarray(s3.shelf_loc[0]), [1, 1])

    def test_no_putdown_on_highway(self):
        env = self.ENV
        s = make_state(env, [[0, 0], [0, 9]], [0, 0], carrying=[0, -1])
        s2, _ = env.step(s, jnp.asarray([TOGGLE_LOAD, NOOP]), jax.random.PRNGKey(0))
        assert int(s2.carrying[0]) == 0  # still carrying

    def test_delivery_reward_and_resample(self):
        env = self.ENV
        goal = env._goal_cells()[0]  # (10, 4)
        # agent 0 stands one cell above the goal carrying requested shelf 0
        s = make_state(env, [[9, 4], [0, 9]], [1, 0], carrying=[0, -1], requested_ids=[0, 5])
        s2, ts = env.step(s, jnp.asarray([FORWARD, NOOP]), jax.random.PRNGKey(0))
        np.testing.assert_array_equal(np.asarray(s2.agent_pos)[0], goal)
        np.testing.assert_allclose(np.asarray(ts.reward), [1.0, 0.0])
        assert not bool(s2.requested[0])  # request fulfilled
        assert int(np.asarray(s2.requested).sum()) == 2  # replacement sampled
        # still carrying the shelf (must return it)
        assert int(s2.carrying[0]) == 0

    def test_no_reward_for_unrequested(self):
        env = self.ENV
        s = make_state(env, [[9, 4], [0, 9]], [1, 0], carrying=[0, -1], requested_ids=[5, 6])
        _, ts = env.step(s, jnp.asarray([FORWARD, NOOP]), jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(ts.reward), [0.0, 0.0])


class TestJit:
    def test_vmapped_random_rollout(self):
        env = parse_rware_name("rware-tiny-4ag-v2")
        E = 16
        states, ts = jax.vmap(env.reset)(jax.random.split(jax.random.PRNGKey(0), E))
        step = jax.jit(jax.vmap(env.step))
        key = jax.random.PRNGKey(1)
        for t in range(30):
            key, k1, k2 = jax.random.split(key, 3)
            actions = jax.random.randint(k1, (E, 4), 0, 5)
            states, ts = step(states, actions, jax.random.split(k2, E))
        assert bool(jnp.all(jnp.isfinite(ts.obs)))
        # agents never overlap
        pos = np.asarray(states.agent_pos)
        for e in range(E):
            assert len({tuple(p) for p in pos[e]}) == 4
        # the request queue stays full
        assert (np.asarray(states.requested).sum(-1) == 4).all()
