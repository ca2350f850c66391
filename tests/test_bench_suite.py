"""The benchmark suite must be runnable (scaled down) on any backend and
report throughput + FLOPs-derived MFU fields for every tracked config."""

import numpy as np
import pytest

from codebase_tpu import bench_suite


class TestBenchSuite:
    def test_all_baseline_configs_tracked(self):
        assert set(bench_suite.CONFIGS) == {
            "idqn_lbf",
            "ia2c_lbf",
            "vdn_shared_lbf10",
            "qmix_rware",
            "qmix_smaclite_3m",
            "qmix_smaclite_mmm2_big",
            "mappo_smaclite_mmm2_big",
            "idqn_lbf_refshape",
            "idqn_rnn_lbf",
            "idqn_rnn_lbf_scan",
        }

    def test_analytic_flops_model(self):
        """The analytic matmul count must match a hand computation — it is
        the MFU numerator (XLA cost analysis counts scan bodies once, so the
        compiled-chunk flops under-count rollouts by ~T x; round-4 fix)."""
        from codebase_tpu.bench_suite import _fwd_macs_per_row, analytic_flops
        from codebase_tpu.config import load_config
        from codebase_tpu.envs.factory import make_env

        # MLP 15 -> 128 -> 128 -> 5: chain of three matmuls
        assert _fwd_macs_per_row(15, (128, 128), 5, False) == (
            15 * 128 + 128 * 128 + 128 * 5
        )
        # GRU: first 15->64, one layer (w_ih 64x192 + w_hh 64x192), final 64->5
        assert _fwd_macs_per_row(15, (64,), 5, True) == (
            15 * 64 + 64 * 3 * 64 * 2 + 64 * 5
        )

        cfg = load_config(
            [
                "+algorithm=idqn",
                "env.name=lbforaging:Foraging-5x5-2p-1f-v3",
                "env.time_limit=5",
                "algorithm.parallel_envs=8",
                "algorithm.batch_size=4",
            ]
        )
        env = make_env("lbforaging:Foraging-5x5-2p-1f-v3", time_limit=5)
        roll_per_step, upd_per_iter = analytic_flops(env, cfg.algorithm, 5, n_updates=2)
        per_row = sum(
            _fwd_macs_per_row(env.obs_dims[i], (128, 128), env.action_dims[i], False)
            for i in range(env.n_agents)
        )
        assert roll_per_step == float(per_row * 2)
        assert upd_per_iter == float(2 * 4 * 6 * per_row * 2 * 4)
        # QMIX: idqn update term + mixer term. Hand computation of one mixer
        # forward per (t, b) row: hypernet W1 (S->hemb->N*emb), hypernet W2
        # (S->hemb->emb), hypernet b1 (S->emb), V(s) (S->emb->1), and the
        # two mixing matmuls (N*emb + emb*1). Charged 4x: online fwd (1) +
        # backward (2) + target fwd (1, stop_gradient, NO backward) — the
        # trailing x2 the round-4 code applied double-counted the target
        # mixer (ADVICE r4).
        qmix_cfg = load_config(
            [
                "+algorithm=qmix",
                "env.name=lbforaging:Foraging-5x5-2p-1f-v3",
                "env.time_limit=5",
                "algorithm.parallel_envs=8",
                "algorithm.batch_size=4",
            ]
        )
        q_roll, q_upd = analytic_flops(env, qmix_cfg.algorithm, 5, n_updates=2)
        S = sum(env.obs_dims)
        emb, hemb, N = 64, 32, env.n_agents
        per_tb = (
            (S * hemb + hemb * N * emb)
            + (S * hemb + hemb * emb)
            + S * emb
            + (S * emb + emb)
            + (N * emb + emb)
        )
        assert q_roll == float(per_row * 2)
        assert q_upd == float(
            2 * 4 * 6 * per_row * 2 * 4 + 2 * 4 * 5 * per_tb * 2 * 4
        )
        # AC family: actor-per-step rollout + bootstrap/update epochs
        ac_cfg = load_config(
            ["+algorithm=ia2c", "env.name=x", "env.time_limit=5",
             "algorithm.parallel_envs=8"]
        )
        ac_roll, ac_upd = analytic_flops(env, ac_cfg.algorithm, 5, 2)
        actor_row = sum(
            _fwd_macs_per_row(env.obs_dims[i], (128, 128), env.action_dims[i], False)
            for i in range(env.n_agents)
        )
        critic_row = sum(
            _fwd_macs_per_row(env.obs_dims[i], (128, 128), 1, False)
            for i in range(env.n_agents)
        )
        assert ac_roll == float(actor_row * 2)
        # target-critic fwd over T+1 rows + 1 epoch of (actor+critic) fwd+bwd
        assert ac_upd == float(
            6 * 8 * critic_row * 2 + 1 * 5 * 8 * (actor_row + critic_row) * 2 * 3
        )

    def test_run_config_scaled_down(self, monkeypatch):
        tiny = dict(
            algo="idqn",
            env="lbforaging:Foraging-5x5-2p-1f-v3",
            time_limit=5,
            overrides=[
                "algorithm.parallel_envs=8",
                "algorithm.batch_size=4",
                "algorithm.updates_per_collect=2",
                "algorithm.buffer_size=32",
                "algorithm.training_start=0",
            ],
        )
        monkeypatch.setitem(bench_suite.CONFIGS, "idqn_lbf", tiny)
        res = bench_suite.run_config("idqn_lbf", windows=1, window_iters=2)
        assert res["env_steps_per_s"] > 0
        assert res["device_kind"]
        # CPU backend reports flops from XLA cost analysis too
        if res["flops_per_step"] is not None:
            assert res["flops_per_step"] > 0
        # mfu / bandwidth roofline only defined on known TPU kinds
        assert "mfu" in res
        assert "hbm_bandwidth_util" in res
        if res["bytes_per_step"] is not None:
            assert res["bytes_per_step"] > 0

    def test_ac_family_config_scaled_down(self, monkeypatch):
        tiny = dict(
            algo="ia2c",
            env="lbforaging:Foraging-5x5-2p-1f-v3",
            time_limit=5,
            overrides=["algorithm.parallel_envs=8"],
        )
        monkeypatch.setitem(bench_suite.CONFIGS, "ia2c_lbf", tiny)
        res = bench_suite.run_config("ia2c_lbf", windows=1, window_iters=2)
        assert res["env_steps_per_s"] > 0
        assert res["algo"] == "ia2c"
