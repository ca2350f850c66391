"""Bayesian sweep backend (`codebase_tpu/bayes.py` + `search.py bayes`).

The reference declares hydra-ax-sweeper (GP Bayesian optimisation) as a
sweep backend (`/root/reference/requirements.txt:10`); this covers the
dependency-free equivalent: GP posterior sanity, EI-driven convergence on a
synthetic objective, and the end-to-end CLI on a tiny training spec.
"""

import io
import json

import numpy as np
import yaml

from codebase_tpu.bayes import AxisEncoder, GPOptimizer, optimise


class TestEncoder:
    def test_numeric_log_and_categorical(self):
        enc = AxisEncoder({"lr": [1e-4, 1e-3, 1e-2], "alg": ["a2c", "ppo"]})
        assert enc.dim == 1 + 2
        x = enc.encode({"lr": 1e-3, "alg": "ppo"})
        np.testing.assert_allclose(x, [0.5, 0.0, 1.0], atol=1e-9)  # log-scaled midpoint

    def test_linear_when_small_span(self):
        enc = AxisEncoder({"gamma": [0.9, 0.95, 1.0]})
        np.testing.assert_allclose(enc.encode({"gamma": 0.95}), [0.5], atol=1e-9)


class TestBO:
    def test_converges_to_optimum_faster_than_random(self):
        # objective: peak at lr=1e-3, gamma=0.99 on a 6x5 grid (30 combos)
        lrs = [10 ** -e for e in (2, 2.5, 3, 3.5, 4, 4.5)]
        gammas = [0.9, 0.95, 0.99, 0.995, 0.999]
        cands = [{"lr": lr, "gamma": g} for lr in lrs for g in gammas]

        def f(c):
            return -((np.log10(c["lr"]) + 3) ** 2) - 50 * (c["gamma"] - 0.99) ** 2

        res = optimise(cands, {"lr": lrs, "gamma": gammas}, f, budget=12, seed=0)
        assert res["best"]["lr"] == 1e-3 and res["best"]["gamma"] == 0.99, res["best"]
        assert len(res["history"]) == 12

    def test_never_revisits_and_exhausts(self):
        cands = [{"x": i} for i in range(5)]
        opt = GPOptimizer(cands, AxisEncoder({"x": list(range(5))}), seed=1, n_init=2)
        seen = []
        for _ in range(5):
            i = opt.suggest()
            assert i not in seen
            seen.append(i)
            opt.observe(i, float(i))
        import pytest

        with pytest.raises(StopIteration):
            opt.suggest()


class TestCLI:
    def test_bayes_heterogeneous_key_sets(self, tmp_path):
        """Tuple-linked specs legitimately give combos DIFFERENT key sets;
        absence must become a categorical level, not a KeyError."""
        import json

        from click.testing import CliRunner

        from codebase_tpu.search import cli

        spec_path = tmp_path / "spec.yaml"
        spec_path.write_text(
            "env.name: matrix-coordination\n"
            "env.time_limit: 1\n"
            "env.parallel_envs: 8\n"
            "+algorithm: idqn\n"
            "algorithm.total_steps: 300\n"
            "algorithm.training_start: 32\n"
            "algorithm.buffer_size: 128\n"
            "algorithm.eval_interval: 100\n"
            "algorithm.eval_episodes: 4\n"
            "linked:\n"
            "- !!python/tuple [{algorithm.lr: 0.001}, {algorithm.batch_size: 8}]\n"
            "- !!python/tuple [{algorithm.gamma: 0.9}]\n"
        )
        out = tmp_path / "bo"
        r = CliRunner().invoke(
            cli,
            ["run", "--config", str(spec_path), "--seeds", "1",
             "bayes", "--budget", "2", "--output", str(out), "--yes"],
            catch_exceptions=False,
        )
        assert r.exit_code == 0, r.output
        summary = json.loads((out / "bayes_result.json").read_text())
        assert summary["evaluations"] == 2
        assert summary["candidates"] == 2

    def test_bayes_mode_end_to_end(self, tmp_path):
        from click.testing import CliRunner

        from codebase_tpu.search import cli

        spec = {
            "env.name": "matrix-coordination",
            "env.time_limit": 1,
            "env.parallel_envs": 8,
            "+algorithm": "idqn",
            "algorithm.total_steps": 300,
            "algorithm.training_start": 32,
            "algorithm.buffer_size": 128,
            "algorithm.batch_size": 8,
            "algorithm.eval_interval": 100,
            "algorithm.eval_episodes": 4,
            "algorithm.lr": [0.0003, 0.001],
            "algorithm.gamma": [0.9, 0.99],
        }
        spec_path = tmp_path / "spec.yaml"
        spec_path.write_text(yaml.safe_dump(spec))
        out = tmp_path / "bo"
        r = CliRunner().invoke(
            cli,
            [
                "run",
                "--config",
                str(spec_path),
                "--seeds",
                "2",
                "bayes",
                "--budget",
                "3",
                "--output",
                str(out),
                "--yes",
            ],
            catch_exceptions=False,
        )
        assert r.exit_code == 0, r.output
        summary = json.loads((out / "bayes_result.json").read_text())
        assert summary["evaluations"] == 3
        assert summary["candidates"] == 4
        assert "algorithm.lr" in summary["best"]
        # each trial trained 2 vmapped seeds and wrote per-seed runs
        trials = sorted(out.glob("trial_*/seed_*/results.csv"))
        assert len(trials) == 6
