"""Multi-device data-parallel path, on the conftest 8-CPU virtual mesh.

Covers `codebase_tpu/parallel/mesh.py` as a PRODUCT feature: both algorithm
families' fused train chunks execute over a mesh with the declared shardings
(replay/env/reward-stream on the data axis, params replicated), the train CLI
reaches the mesh through `distributed.devices`, vmapped sweeps shard their
seed axis, and single-device vs 8-device training agrees for a fixed seed.
The reference has no distributed backend of any kind (SURVEY.md §2); this is
the framework's TPU-native addition.
"""

import numpy as np
import jax
import pytest
from jax.sharding import PartitionSpec as P

from codebase_tpu.config import load_config
from codebase_tpu.envs.factory import make_env
from codebase_tpu.parallel.mesh import DATA_AXIS, make_mesh, mesh_from_config


def _dqn_build(mesh, n_envs=8, algo="idqn", wrappers=None):
    from codebase_tpu.algos.dqn import build_train_functions

    env = make_env("Foraging-5x5-2p-1f-v3", time_limit=5, wrappers=wrappers)
    cfg = load_config(
        [f"+algorithm={algo}", "algorithm.training_start=0",
         "algorithm.buffer_size=32", "algorithm.batch_size=8"]
    )
    cfg.algorithm.parallel_envs = n_envs
    return build_train_functions(env, env, cfg.algorithm, 5, mesh=mesh)


def _ac_build(mesh, n_envs=8, standardise=False):
    from codebase_tpu.algos.ac import build_train_functions

    env = make_env(
        "Foraging-5x5-2p-1f-v3", time_limit=5, standardise_rewards=standardise
    )
    cfg = load_config(["+algorithm=ia2c"])
    cfg.algorithm.parallel_envs = n_envs
    return build_train_functions(env, env, cfg.algorithm, 5, mesh=mesh)


class TestMeshTraining:
    def test_virtual_mesh_available(self):
        assert len(jax.devices()) >= 8, "conftest must fake 8 CPU devices"

    def test_dqn_train_chunk_runs_with_declared_shardings(self):
        mesh = make_mesh(8)
        _, init_state, train_chunk, _ = _dqn_build(mesh)
        state = init_state(jax.random.PRNGKey(0))
        # replay sharded over the episode-slot axis; learner replicated
        assert state.buffer.obs.sharding.spec == P(DATA_AXIS)
        assert state.buffer.actions.sharding.spec == P(DATA_AXIS)
        assert jax.tree.leaves(state.params)[0].sharding.is_fully_replicated
        assert jax.tree.leaves(state.opt_state)[0].sharding.is_fully_replicated

        state, metrics = train_chunk(state, 2)
        assert int(state.env_steps) > 0 and int(state.updates) > 0
        losses = np.asarray(metrics["loss"])
        assert np.isfinite(losses[-1])
        # shardings survive the jitted chunk (no silent full replication)
        assert state.buffer.obs.sharding.spec == P(DATA_AXIS)
        assert jax.tree.leaves(state.params)[0].sharding.is_fully_replicated

    def test_ac_train_chunk_runs_with_declared_shardings(self):
        mesh = make_mesh(8)
        _, init_state, train_chunk, _ = _ac_build(mesh, standardise=True)
        state = init_state(jax.random.PRNGKey(0))
        assert jax.tree.leaves(state.params)[0].sharding.is_fully_replicated
        # per-env reward streams shard like the env batch
        assert state.reward_stream.sumw.sharding.spec == P(DATA_AXIS)

        state, metrics = train_chunk(state, 2)
        assert int(state.updates) == 2
        assert np.isfinite(np.asarray(metrics["loss"])).all()
        assert state.reward_stream.sumw.sharding.spec == P(DATA_AXIS)
        # streams persisted and grew across the chunk's rollouts
        assert np.all(np.asarray(state.reward_stream.n) >= 2)

    def test_single_vs_eight_devices_same_seed_agree(self):
        """Sharding must not change the math: the same PRNG seed produces the
        same training trajectory (up to reduction-order float noise)."""
        _, init1, chunk1, _ = _dqn_build(None)
        _, init8, chunk8, _ = _dqn_build(make_mesh(8))
        s1 = init1(jax.random.PRNGKey(0))
        s8 = init8(jax.random.PRNGKey(0))
        s1, m1 = chunk1(s1, 3)
        s8, m8 = chunk8(s8, 3)
        assert int(s1.env_steps) == int(s8.env_steps)
        assert int(s1.updates) == int(s8.updates)
        np.testing.assert_allclose(
            np.asarray(m1["loss"]), np.asarray(m8["loss"]), rtol=1e-4, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(m1["episode_returns"]), np.asarray(m8["episode_returns"]),
            atol=1e-6,
        )

    def test_mesh_from_config(self):
        cfg = load_config(["+algorithm=idqn", "distributed.devices=8"])
        mesh = mesh_from_config(cfg.get("distributed"))
        assert mesh is not None and mesh.size == 8
        # default: no mesh
        assert mesh_from_config(load_config(["+algorithm=idqn"]).get("distributed")) is None
        # "all" uses every visible device
        cfg_all = load_config(["+algorithm=idqn", "distributed.devices=all"])
        assert mesh_from_config(cfg_all.get("distributed")).size == len(jax.devices())


class TestMeshProduct:
    def test_run_cli_trains_data_parallel(self, tmp_path):
        """`python -m codebase_tpu.run ... distributed.devices=8` trains end
        to end and writes a reference-compatible results.csv."""
        import pandas as pd

        from codebase_tpu import run as run_cli

        run_cli.main(
            ["+algorithm=qmix", "env.name=Foraging-5x5-2p-1f-v3",
             "env.time_limit=5", "env.parallel_envs=8",
             "algorithm.total_steps=600", "algorithm.training_start=0",
             "algorithm.batch_size=4", "algorithm.buffer_size=16",
             "algorithm.eval_interval=300", "algorithm.eval_episodes=2",
             "distributed.devices=8", f"run_dir={tmp_path / 'run'}", "seed=0"]
        )
        df = pd.read_csv(tmp_path / "run" / "results.csv")
        assert len(df) >= 1 and "mean_episode_returns" in df.columns

    def test_sweep_shards_seed_axis(self, tmp_path):
        from codebase_tpu.sweep import run_vmapped_multiseed

        cfg = load_config(
            ["+algorithm=idqn", "env.name=matrix-coordination", "env.time_limit=1",
             "algorithm.total_steps=300", "algorithm.training_start=0",
             "algorithm.buffer_size=64", "algorithm.batch_size=8",
             "algorithm.eval_interval=150", "algorithm.eval_episodes=2",
             "distributed.devices=8"]
        )
        cfg.algorithm.parallel_envs = 8
        dirs = run_vmapped_multiseed(cfg, list(range(8)), tmp_path / "grp")
        assert len(dirs) == 8
        for d in dirs:
            assert (d / "results.csv").stat().st_size > 0

    def test_sweep_seed_count_must_divide(self, tmp_path):
        from codebase_tpu.sweep import run_vmapped_multiseed

        cfg = load_config(
            ["+algorithm=idqn", "env.name=matrix-coordination", "env.time_limit=1",
             "algorithm.total_steps=10", "distributed.devices=8"]
        )
        cfg.algorithm.parallel_envs = 4
        with pytest.raises(AssertionError, match="divide"):
            run_vmapped_multiseed(cfg, [0, 1, 2], tmp_path / "grp")
