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
            "idqn_rnn_lbf",
            "idqn_rnn_lbf_scan",
        }

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
