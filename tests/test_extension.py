"""User-algorithm extension surface: registry registration, dotted-path
`algorithm.entry` dispatch, and external preset files — the framework's
equivalent of the reference's copy-a-folder + `_target_` workflow
(`/root/reference/README.md:140-177`)."""

import textwrap

import pytest

from codebase_tpu import run as run_cli
from codebase_tpu.algos.registry import (
    ALGORITHMS,
    get_algorithm,
    register_algorithm,
)
from codebase_tpu.config import load_algorithm_preset, load_config

def dummy_entry(env, eval_env, logger, time_limit, cfg, mesh=None):
    # write evidence to the run dir: the dispatching import may hold a
    # second instance of this module, so in-memory state is unreliable
    from pathlib import Path

    run_dir = cfg.get("run_dir")
    if run_dir:
        (Path(run_dir) / "dummy_called.txt").write_text(
            f"{env.n_agents},{time_limit},{cfg.algorithm.name}"
        )
    return {"ok": True}


class TestRegistry:
    def test_register_and_dispatch(self):
        register_algorithm("dummy_algo", dummy_entry)
        try:
            assert get_algorithm("dummy_algo") is dummy_entry
        finally:
            ALGORITHMS.pop("dummy_algo")

    def test_entry_dotted_path_wins(self):
        # pytest may hold a second instance of this module, so compare by
        # qualified name rather than identity
        fn = get_algorithm("whatever", entry="tests.test_extension:dummy_entry")
        assert fn.__qualname__ == dummy_entry.__qualname__
        # module.attr form too
        fn = get_algorithm("whatever", entry="tests.test_extension.dummy_entry")
        assert fn.__qualname__ == dummy_entry.__qualname__

    def test_bad_entry_raises(self):
        with pytest.raises(ValueError, match="pkg.module:fn"):
            get_algorithm("x", entry="justamodule")

    def test_unknown_name_lists_available(self):
        with pytest.raises(ValueError, match="idqn"):
            get_algorithm("nosuch")


class TestExternalPreset:
    def test_external_yaml_preset(self, tmp_path):
        preset = tmp_path / "my_algo.yaml"
        preset.write_text(
            textwrap.dedent(
                """
                defaults: [ia2c]
                algorithm:
                  name: my_algo
                  entry: tests.test_extension:dummy_entry
                  lr: 0.001
                """
            )
        )
        data = load_algorithm_preset(str(preset))
        assert data["algorithm"]["name"] == "my_algo"
        assert data["algorithm"]["n_steps"] == 5  # inherited from ia2c base
        assert data["algorithm"]["lr"] == 0.001

    def test_missing_external_preset(self):
        with pytest.raises(ValueError, match="not found"):
            load_algorithm_preset("./nope/missing.yaml")


class TestEndToEndDispatch:
    def test_run_cli_dispatches_custom_entry(self, tmp_path):
        preset = tmp_path / "my_algo.yaml"
        preset.write_text(
            textwrap.dedent(
                """
                defaults: [ia2c]
                algorithm:
                  name: my_algo
                  entry: tests.test_extension:dummy_entry
                """
            )
        )
        run_cli.main(
            [
                f"+algorithm={preset}",
                "env.name=lbforaging:Foraging-5x5-2p-1f-v3",
                "env.time_limit=5",
                "seed=0",
                f"run_dir={tmp_path / 'run'}",
            ]
        )
        assert (tmp_path / "run" / "dummy_called.txt").read_text() == "2,5,my_algo"
