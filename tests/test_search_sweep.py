"""Tests for the sweep spec expansion and vmapped multi-seed training."""

import io
from pathlib import Path

import numpy as np
import yaml
import pytest

from codebase_tpu.config import load_config
from codebase_tpu.search import _SweepLoader, gen_combos, seed_and_shuffle
from codebase_tpu.sweep import run_vmapped_multiseed


SPEC = """
algorithm.eval_episodes: 10

algorithm.standardise_returns:
  - true
  - false

hparam-tuples-1:
  - !!python/tuple [{env.name: "matrix-coordination"}, {env.time_limit: 1}]
  - !!python/tuple [{env.name: "matrix-penalty"}, {env.time_limit: 1}]

hparam-tuples-2:
  - !!python/tuple
    - {"+algorithm": "idqn"}
    - {algorithm.batch_size: [128, 256]}
  - !!python/tuple
    - {"+algorithm": "ia2c"}
    - {algorithm.entropy_coef: [0.01, 0.001]}
"""


class TestCombos:
    def test_cartesian_counts(self):
        spec = yaml.load(io.StringIO(SPEC), Loader=_SweepLoader)
        combos = gen_combos(spec)
        # 2 (standardise) x 2 (env tuple) x (2 idqn-bs + 2 ia2c-entropy) = 16
        assert len(combos) == 16
        # every combo carries the constant
        assert all(any(c.startswith("algorithm.eval_episodes=10") for c in combo) for combo in combos)
        # tuple-linked params stay together
        for combo in combos:
            joined = " ".join(combo)
            if "matrix-penalty" in joined:
                assert "env.time_limit=1" in joined
            if "+algorithm=idqn" in joined:
                assert "batch_size" in joined
                assert "entropy_coef" not in joined

    def test_seed_and_shuffle_deterministic(self):
        spec = yaml.load(io.StringIO(SPEC), Loader=_SweepLoader)
        combos = gen_combos(spec)
        a = seed_and_shuffle(combos, True, 3)
        b = seed_and_shuffle(combos, True, 3)
        assert a == b
        assert len(a) == 16 * 3
        assert any(t.startswith("+hypergroup=") for t in a[0])

    def test_combo_tokens_load(self):
        spec = yaml.load(io.StringIO(SPEC), Loader=_SweepLoader)
        tokens = [
            t
            for t in seed_and_shuffle(gen_combos(spec), True, 1)[0]
            if not t.startswith(("seed=", "+hypergroup"))
        ]
        cfg = load_config(tokens)
        assert cfg.env.name.startswith("matrix-")
        assert cfg.algorithm.name in ("idqn", "ia2c")


class TestVmappedSweep:
    def test_multiseed_idqn_writes_runs(self, tmp_path):
        cfg = load_config(
            [
                "+algorithm=idqn",
                "env.name=matrix-coordination",
                "env.time_limit=1",
                "algorithm.total_steps=600",
                "algorithm.training_start=32",
                "algorithm.buffer_size=256",
                "algorithm.batch_size=16",
                "algorithm.eval_interval=200",
                "algorithm.eval_episodes=8",
            ]
        )
        cfg.algorithm.parallel_envs = 8
        dirs = run_vmapped_multiseed(cfg, [0, 1, 2, 3], tmp_path / "grp")
        assert len(dirs) == 4
        import pandas as pd

        for i, d in enumerate(dirs):
            df = pd.read_csv(d / "results.csv")
            assert "mean_episode_returns" in df.columns
            assert len(df) >= 2
            saved = yaml.safe_load((d / "config.yaml").read_text())
            assert saved["seed"] == i
        # different seeds produce different training trajectories
        import pandas as pd

        r0 = pd.read_csv(dirs[0] / "results.csv")["mean_episode_returns"]
        r1 = pd.read_csv(dirs[1] / "results.csv")["mean_episode_returns"]
        assert not np.allclose(r0, r1)

    def test_lr_grid_folds_into_vmap(self, tmp_path):
        """SURVEY §2 'vmap over seed/hyperparam axes': an lr grid x seeds
        trains every combination in ONE compiled program, writing per-combo
        reference-compatible run dirs (VERDICT r2 item 8)."""
        cfg = load_config(
            [
                "+algorithm=idqn",
                "env.name=matrix-coordination",
                "env.time_limit=1",
                "algorithm.total_steps=600",
                "algorithm.training_start=32",
                "algorithm.buffer_size=256",
                "algorithm.batch_size=16",
                "algorithm.eval_interval=200",
                "algorithm.eval_episodes=8",
            ]
        )
        cfg.algorithm.parallel_envs = 8
        variants = [{"lr": 3e-4}, {"lr": 1.0}]  # absurd lr to force divergence
        dirs = run_vmapped_multiseed(
            cfg, [0, 1], tmp_path / "grid", hyper_variants=variants
        )
        assert len(dirs) == 4  # 2 lr x 2 seeds
        import pandas as pd

        saved = [yaml.safe_load((d / "config.yaml").read_text()) for d in dirs]
        assert [s["algorithm"]["lr"] for s in saved] == [3e-4, 3e-4, 1.0, 1.0]
        assert [s["seed"] for s in saved] == [0, 1, 0, 1]
        # the lr actually bites: same seed, different lr -> different losses
        l_small = pd.read_csv(dirs[0] / "results.csv")["loss"].dropna()
        l_big = pd.read_csv(dirs[2] / "results.csv")["loss"].dropna()
        assert len(l_small) and len(l_big)
        assert not np.allclose(l_small, l_big)

    def test_gamma_and_tau_variants(self, tmp_path):
        cfg = load_config(
            [
                "+algorithm=idqn",
                "env.name=matrix-coordination",
                "env.time_limit=1",
                "algorithm.total_steps=400",
                "algorithm.training_start=32",
                "algorithm.buffer_size=256",
                "algorithm.batch_size=16",
                "algorithm.eval_interval=200",
                "algorithm.eval_episodes=4",
            ]
        )
        cfg.algorithm.parallel_envs = 8
        dirs = run_vmapped_multiseed(
            cfg,
            [0],
            tmp_path / "gt",
            hyper_variants=[{"gamma": 0.9, "tau": 100}, {"gamma": 0.5, "tau": 300}],
        )
        assert len(dirs) == 2
        # tau regime mismatch is rejected loudly
        import pytest

        with pytest.raises(AssertionError, match="regime"):
            run_vmapped_multiseed(
                cfg, [0], tmp_path / "bad", hyper_variants=[{"tau": 0.5}, {"tau": 300}]
            )
