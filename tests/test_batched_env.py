"""Batched (env-axis-last) fast path == vmapped scalar path, exactly.

`LevelBasedForaging.step_batch` is a layout-optimised rewrite of the scalar
`step`; these tests pin bit-exact equivalence of transitions, observations,
rewards, termination, and the wrapper stack's batched methods.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from codebase_tpu.envs.factory import make_base_env, make_env
from codebase_tpu.envs.lbforaging import LevelBasedForaging
from codebase_tpu.envs.vector import collect_episodes

E = 64
STEPS = 12


def _random_rollout_equal(base: LevelBasedForaging, key):
    k_reset, k_act = jax.random.split(jax.random.PRNGKey(key))
    states, ts_s = jax.vmap(base.reset)(jax.random.split(k_reset, E))
    bstates = base.to_batch(states)
    acts = jax.random.randint(k_act, (STEPS, E, base.n_agents), 0, base.n_actions)

    vstep = jax.jit(jax.vmap(base.step, in_axes=(0, 0, 0)))
    bstep = jax.jit(base.step_batch)
    for i in range(STEPS):
        keys = jax.random.split(jax.random.PRNGKey(1000 + i), E)
        states, ts_s = vstep(states, acts[i], keys)
        bstates, ts_b = bstep(bstates, acts[i], jax.random.PRNGKey(0))
        np.testing.assert_array_equal(np.asarray(ts_s.obs), np.asarray(ts_b.obs))
        np.testing.assert_allclose(
            np.asarray(ts_s.reward), np.asarray(ts_b.reward), rtol=1e-6, atol=1e-7
        )
        np.testing.assert_array_equal(
            np.asarray(ts_s.terminated), np.asarray(ts_b.terminated)
        )
        rt = base.from_batch(bstates)
        np.testing.assert_array_equal(np.asarray(states.agent_pos), np.asarray(rt.agent_pos))
        np.testing.assert_array_equal(np.asarray(states.food_active), np.asarray(rt.food_active))


@pytest.mark.parametrize(
    "name", ["Foraging-8x8-2p-3f-v3", "Foraging-10x10-3p-3f-v3", "Foraging-2s-8x8-2p-2f-coop-v3"]
)
def test_lbf_step_batch_matches_vmapped_scalar(name):
    _random_rollout_equal(make_base_env(f"lbforaging:{name}"), key=3)


@pytest.mark.parametrize(
    "name", ["Foraging-8x8-2p-3f-v3", "Foraging-10x10-3p-3f-v3", "Foraging-8x8-2p-2f-coop-v3"]
)
def test_lbf_reset_batch_bit_exact(name):
    """reset_batch == vmap(reset) over the same key split, bit for bit
    (the E-last spawn logic reproduces per-env categorical draws exactly)."""
    base = make_base_env(f"lbforaging:{name}")
    key = jax.random.PRNGKey(9)
    states, ts = jax.jit(jax.vmap(base.reset))(jax.random.split(key, E))
    bstate, bts = jax.jit(base.reset_batch, static_argnums=1)(key, E)
    rt = base.from_batch(bstate)
    for field in ("agent_pos", "agent_level", "food_pos", "food_level", "food_active", "food_spawned"):
        np.testing.assert_array_equal(
            np.asarray(getattr(states, field)), np.asarray(getattr(rt, field)), err_msg=field
        )
    np.testing.assert_array_equal(np.asarray(ts.obs), np.asarray(bts.obs))


def test_lbf_step_batch_with_penalty():
    env = LevelBasedForaging(rows=6, cols=6, num_agents=2, max_food=2, sight=6, penalty=0.1)
    _random_rollout_equal(env, key=5)


def _rollouts_for(wrappers, observe_id=False, standardise=False):
    env = make_env(
        "lbforaging:Foraging-8x8-2p-3f-v3",
        time_limit=15,
        observe_id=observe_id,
        standardise_rewards=standardise,
        wrappers=wrappers,
    )

    def policy(carry, obs, mask, key):
        a = jax.random.randint(key, (obs.shape[0], env.n_agents), 0, env.n_actions)
        return carry, a

    rollout = jax.jit(lambda k: collect_episodes(env, policy, None, k, E, 15)[0])(
        jax.random.PRNGKey(7)
    )
    return env, rollout


def test_wrapped_batched_rollout_consistency():
    """Full wrapper stack over the batched fast path: rewards respect the
    cooperative wrapper, obs carry the one-hot id, shapes/filleds coherent."""
    env, rollout = _rollouts_for(["CooperativeReward"], observe_id=True)
    obs = np.asarray(rollout.obs)  # (T+1, E, N, D)
    assert obs.shape[-1] == env.obs_dim
    # one-hot ids prepended
    ids = obs[..., : env.n_agents]
    filled = np.asarray(rollout.filled)  # (T, E)
    live = filled[..., None] > 0
    eye = np.eye(env.n_agents)[None, None]
    assert np.all((ids[1:] == eye) | ~live[..., None])
    # cooperative: every agent sees the same (team) reward
    rew = np.asarray(rollout.rewards)
    assert np.allclose(rew[..., 0], rew[..., 1], atol=1e-6)
    # stat rewards stay raw: episode returns equal the sum of raw rewards
    stat = np.asarray(rollout.stat_rewards)
    assert np.allclose(
        np.asarray(rollout.episode_returns), (stat * filled[..., None]).sum(0), atol=1e-5
    )


def test_standardise_reward_marker_is_identity():
    """The StandardiseReward wrapper is a pure marker: the env reward channel
    passes through raw (standardisation is applied by the train loops via a
    persistent RewardStream, see ops/reward_stream.py), and
    `standardisation_plan` detects the marker's position."""
    from codebase_tpu.envs.wrappers import standardisation_plan

    env, rollout = _rollouts_for(None, standardise=True)
    np.testing.assert_array_equal(
        np.asarray(rollout.rewards), np.asarray(rollout.stat_rewards)
    )
    plan = standardisation_plan(env)
    assert plan is not None and plan.above == () and plan.below == ()
    # CooperativeReward listed after the marker re-applies above it
    env2 = make_env(
        "lbforaging:Foraging-8x8-2p-3f-v3", time_limit=15,
        standardise_rewards=True, wrappers=["CooperativeReward"],
    )
    plan2 = standardisation_plan(env2)
    assert len(plan2.above) == 1 and plan2.below == ()


def test_collect_episodes_batched_equals_legacy_vmap_path():
    """The harness over a native-batched env produces identical rollouts to
    forcing the default vmap path (LBF reset_batch reuses the same per-env
    key split and its step is deterministic)."""
    env = make_env("lbforaging:Foraging-8x8-2p-3f-v3", time_limit=10)

    class ForceVmap(type(env)):
        def reset_batch(self, key, n):
            return jax.vmap(self.reset)(jax.random.split(key, n))

        def step_batch(self, state, actions, key, current_mask=None):
            del current_mask
            return jax.vmap(self.step)(state, actions, jax.random.split(key, actions.shape[0]))

    env_v = ForceVmap(env=env.env, limit=env.limit)

    def policy(carry, obs, mask, key):
        # obs-dependent so the batched obs path is exercised
        a = (jnp.sum(obs, axis=-1).astype(jnp.int32) + jax.random.randint(
            key, (obs.shape[0], env.n_agents), 0, env.n_actions)) % env.n_actions
        return carry, a

    r1 = jax.jit(lambda k: collect_episodes(env, policy, None, k, E, 10)[0])(
        jax.random.PRNGKey(11)
    )
    r2 = jax.jit(lambda k: collect_episodes(env_v, policy, None, k, E, 10)[0])(
        jax.random.PRNGKey(11)
    )
    for name in ("obs", "actions", "rewards", "dones", "filled"):
        np.testing.assert_array_equal(
            np.asarray(getattr(r1, name)), np.asarray(getattr(r2, name)), err_msg=name
        )


class TestRWAREBatched:
    """RWARE env-axis-last fast path == vmapped scalar path."""

    def test_storage_formula_matches_grid(self):
        from codebase_tpu.envs.rware import RWARE

        for kw in ({}, dict(shelf_rows=2, shelf_columns=5), dict(shelf_rows=3, shelf_columns=5)):
            env = RWARE(**kw)
            grid = np.asarray(env._storage_grid())
            rr = jnp.arange(env.rows)[:, None]
            cc = jnp.arange(env.cols)[None, :]
            formula = np.asarray(env._is_storage(rr, cc))
            np.testing.assert_array_equal(grid, formula)

    @pytest.mark.parametrize("name", ["rware:rware-tiny-2ag-v2", "rware:rware-small-4ag-v2"])
    def test_step_batch_matches_vmapped_scalar(self, name):
        from codebase_tpu.envs.factory import make_base_env

        base = make_base_env(name)
        EE = 32
        k_reset, k_act = jax.random.split(jax.random.PRNGKey(11))
        states, ts_s = jax.vmap(base.reset)(jax.random.split(k_reset, EE))
        bstates = base.to_batch(states)
        np.testing.assert_array_equal(
            np.asarray(jax.vmap(base._make_obs)(states)),
            np.asarray(base._make_obs_batch(bstates)),
        )
        acts = jax.random.randint(k_act, (10, EE, base.n_agents), 0, base.n_actions)
        vstep = jax.jit(jax.vmap(base.step, in_axes=(0, 0, 0)))
        bstep = jax.jit(base.step_batch)
        for i in range(10):
            step_key = jax.random.PRNGKey(2000 + i)
            keys = jax.random.split(step_key, EE)  # the harness's key stream
            states, ts_s = vstep(states, acts[i], keys)
            bstates, ts_b = bstep(bstates, acts[i], step_key)
            np.testing.assert_array_equal(np.asarray(ts_s.obs), np.asarray(ts_b.obs), err_msg=f"obs step {i}")
            np.testing.assert_array_equal(np.asarray(ts_s.reward), np.asarray(ts_b.reward))
            rt = base.from_batch(bstates)
            for f in ("agent_pos", "agent_dir", "carrying", "shelf_loc", "shelf_carried", "requested"):
                np.testing.assert_array_equal(
                    np.asarray(getattr(states, f)), np.asarray(getattr(rt, f)), err_msg=f"{f} step {i}"
                )

    def test_rware_rollout_through_harness(self):
        env = make_env("rware:rware-tiny-2ag-v2", time_limit=20)

        def policy(carry, obs, mask, key):
            a = jax.random.randint(key, (obs.shape[0], env.n_agents), 0, env.n_actions)
            return carry, a

        rollout = jax.jit(lambda k: collect_episodes(env, policy, None, k, 16, 20)[0])(
            jax.random.PRNGKey(3)
        )
        assert rollout.obs.shape == (21, 16, 2, env.obs_dim)
        assert np.isfinite(np.asarray(rollout.episode_returns)).all()


class TestSmacLiteBatched:
    """SMAClite env-axis-last fast path == vmapped scalar path (masks, obs,
    combat resolution, scripted AI, medivac heals)."""

    @pytest.mark.parametrize("name", ["3m-v0", "5m_vs_6m-v0", "2s3z-v0", "MMM-v0"])
    def test_step_batch_matches_vmapped_scalar(self, name):
        base = make_base_env(f"smaclite:{name}")
        EE = 32
        k_reset, k_act = jax.random.split(jax.random.PRNGKey(21))
        states, ts_s = jax.vmap(base.reset)(jax.random.split(k_reset, EE))
        bstates = base.to_batch(states)
        np.testing.assert_array_equal(
            np.asarray(jax.vmap(base._make_obs)(states)),
            np.asarray(base._make_obs_batch(bstates)),
        )
        np.testing.assert_array_equal(
            np.asarray(jax.vmap(base.avail_actions)(states)),
            np.asarray(base._avail_actions_batch(bstates)),
        )
        vstep = jax.jit(jax.vmap(base.step, in_axes=(0, 0, 0)))
        bstep = jax.jit(base.step_batch)
        for i in range(12):
            # mix of random (often-invalid) and mask-sampled actions
            k = jax.random.PRNGKey(3000 + i)
            mask = jax.vmap(base.avail_actions)(states)
            logits = jnp.where(mask > 0, 0.0, -jnp.inf)
            acts = jax.random.categorical(k, logits, axis=-1).astype(jnp.int32)
            if i % 3 == 0:  # throw in raw random actions (invalid -> STOP)
                acts = jax.random.randint(k, acts.shape, 0, base.n_actions)
            keys = jax.random.split(jax.random.PRNGKey(4000 + i), EE)
            states, ts_s = vstep(states, acts, keys)
            bstates, ts_b = bstep(bstates, acts, jax.random.PRNGKey(0))
            np.testing.assert_allclose(
                np.asarray(ts_s.obs), np.asarray(ts_b.obs), rtol=1e-6, atol=1e-6,
                err_msg=f"obs step {i}",
            )
            np.testing.assert_allclose(
                np.asarray(ts_s.reward), np.asarray(ts_b.reward), rtol=1e-6, atol=1e-7
            )
            np.testing.assert_array_equal(
                np.asarray(ts_s.action_mask), np.asarray(ts_b.action_mask)
            )
            np.testing.assert_array_equal(
                np.asarray(ts_s.terminated), np.asarray(ts_b.terminated)
            )
            rt = base.from_batch(bstates)
            for f in ("ally_pos", "ally_hp", "ally_cd", "enemy_pos", "enemy_hp", "enemy_cd"):
                np.testing.assert_allclose(
                    np.asarray(getattr(states, f)), np.asarray(getattr(rt, f)),
                    rtol=1e-6, atol=1e-6, err_msg=f"{f} step {i}",
                )

    def test_masked_training_uses_batched_path(self):
        """QMIX train chunk over the native batched smaclite path."""
        from codebase_tpu.algos.dqn import build_train_functions
        from codebase_tpu.config import load_config

        env = make_env("smaclite:2s3z-v0", time_limit=15)
        cfg = load_config(
            ["+algorithm=qmix", "algorithm.training_start=0",
             "algorithm.buffer_size=16", "algorithm.batch_size=4"]
        )
        cfg.algorithm.parallel_envs = 4
        _, init_state, train_chunk, _ = build_train_functions(env, env, cfg.algorithm, 15)
        state = init_state(jax.random.PRNGKey(0))
        state, metrics = train_chunk(state, 2)
        losses = np.asarray(metrics["loss"])
        assert np.isfinite(losses[~np.isnan(losses)]).all()


def test_step_batch_with_carried_mask_is_bit_identical():
    """`current_mask` is a pure speed knob: passing the carried availability
    mask into step_batch must produce bit-identical transitions to the
    recompute path (rollouts pass it — `envs/vector.py`)."""
    import jax
    import numpy as np

    from codebase_tpu.envs.factory import make_base_env

    env = make_base_env("smaclite:3m-v0")
    key = jax.random.PRNGKey(3)
    states, ts = env.reset_batch(key, 32)
    for i in range(5):
        k_a, k_s, key = jax.random.split(key, 3)
        actions = jax.random.categorical(
            k_a, jnp.where(ts.action_mask > 0, 0.0, -1e9)
        ).astype(jnp.int32)
        s1, t1 = env.step_batch(states, actions, k_s)
        s2, t2 = env.step_batch(states, actions, k_s, ts.action_mask)
        for a, b in zip(jax.tree.leaves((s1, t1)), jax.tree.leaves((s2, t2))):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        states, ts = s1, t1
