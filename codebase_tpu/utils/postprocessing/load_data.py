"""Run/Group data model over results.csv trees.

Reference: `marlbase/utils/postprocessing/load_data.py`. Loads every
`results.csv` under a directory, groups runs with identical configs (seed
excluded), and derives minimal distinguishing-hyperparameter group names
(`load_data.py:97-147`). Works on this framework's run layout (config.yaml
next to results.csv) and — because the results.csv schema is byte-compatible
— also on runs produced by the reference itself.
"""

from __future__ import annotations

from collections import defaultdict
from pathlib import Path
from typing import Dict, List, Union

import numpy as np
import pandas as pd
import yaml


class Run:
    def __init__(self, config: dict, data: Dict[str, List[float]], path: Path):
        self.config = config
        self.data = data
        self.path = path

    @staticmethod
    def from_path(path: Path) -> "Run":
        path = Path(path)
        assert path.is_dir(), f"{path} is not a valid run directory"
        data = pd.read_csv(path / "results.csv").to_dict(orient="list")
        config = yaml.safe_load((path / "config.yaml").read_text())
        return Run(config, data, path)

    def __str__(self):
        return f"Run {self.path}"

    def get_config_name(self) -> str:
        return " ".join(
            f"{k}={v}" for k, v in sorted(flatten_config(self.config).items()) if k != "seed"
        )


class Group:
    def __init__(self, name: str, runs: List[Run]):
        self.name = name
        self.config = dict(runs[0].config)
        self.config.pop("seed", None)
        self.runs = runs

    def __str__(self):
        return f"Group {self.name} ({len(self.runs)} runs)"

    @property
    def env_name(self) -> str:
        return self.config.get("env", {}).get("name", "?")

    def has_metric(self, key: str) -> bool:
        have = [key in run.data for run in self.runs]
        assert all(have) or not any(have), f"Key {key} is present in some but not all runs"
        return have[0]

    def get_metric(self, key: str) -> np.ndarray:
        assert self.has_metric(key), f"Key {key} is not present in all runs"
        values = [run.data[key] for run in self.runs]
        n = min(len(v) for v in values)
        return np.array([v[:n] for v in values])


def flatten_config(config: dict, base: str | None = None) -> Dict[str, Union[str, float, int]]:
    flat = {}
    for key, value in config.items():
        name = f"{base}.{key}" if base else str(key)
        if isinstance(value, dict):
            flat.update(flatten_config(value, name))
        else:
            flat[name] = tuple(value) if isinstance(value, list) else value
    return flat


def load_runs(path: Path) -> List[Run]:
    path = Path(path)
    assert path.is_dir(), f"{path} is not a valid directory"
    return [Run.from_path(p.parent) for p in sorted(path.glob("**/results.csv"))]


IGNORED_KEYS = ("seed", "algorithm.name", "hypergroup", "run_dir")


def load_and_group_runs(path: Path, minimal_name: bool = True) -> List[Group]:
    """Group runs by config identity; optionally rename groups with only the
    hyperparameters that actually vary across the loaded runs
    (`load_data.py:97-147`)."""
    by_name = defaultdict(list)
    for run in load_runs(path):
        by_name[run.get_config_name()].append(run)

    if minimal_name:
        values_by_key = defaultdict(set)
        for runs in by_name.values():
            for key, value in flatten_config(runs[0].config).items():
                if key in IGNORED_KEYS or "wrappers" in key:
                    continue
                values_by_key[key].add(value)
        distinguishing = [k for k, vals in values_by_key.items() if len(vals) > 1]

        renamed = {}
        for runs in by_name.values():
            flat = flatten_config(runs[0].config)
            name = str(flat.get("algorithm.name", "run")).upper()
            detail = " ".join(f"{k}={flat[k]}" for k in distinguishing if k in flat)
            if detail:
                name += f" ({detail})"
            renamed.setdefault(name, []).extend(runs)
        by_name = renamed

    return [Group(name, runs) for name, runs in by_name.items()]
