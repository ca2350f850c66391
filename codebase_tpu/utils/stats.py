"""rliable-style performance matrices from results.csv trees.

Reference: `marlbase/utils/stats.py:37-178`. Builds the matrices consumed by
rliable's aggregate-metric / performance-profile / probability-of-improvement
/ sample-efficiency plots:

- `make_agg_metrics_intervals` -> {algo: (n_runs, n_envs)} at a fixed step,
- `make_agg_metrics_pxy` -> {"a,b": ((n_runs, n_envs), (n_runs, n_envs))},
- `make_agg_metrics_efficiency` -> {algo: (n_runs, n_envs, n_steps)}.

Folder layout: `folder/algo/<run-hash>/results.csv` — each run hash is one
seed of one config, as produced by the train CLI.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import pandas as pd


def _load_data_from_subfolder(folder, metric, step=None, step_metric=None):
    """Collect metric series (or the value at a fixed step) from each run
    subfolder (`stats.py:7-33`)."""
    results = []
    for sub in sorted(os.listdir(folder)):
        csv = Path(folder) / sub / "results.csv"
        if not csv.exists():
            continue
        data = pd.read_csv(csv)
        if step is not None and step_metric is not None:
            rows = data[data[step_metric] == step][metric].tolist()
            assert rows, f"no row with {step_metric}=={step} in {csv}"
            results.append([rows[0]])
        else:
            results.append(data[metric].tolist())
    return results


def make_agg_metrics_intervals(folders, algos, metric, step=None, step_metric=None):
    """{algo: (n_runs, n_envs)} fixed-step performance matrices
    (`stats.py:37-86`)."""
    if step is None or step_metric is None:
        raise ValueError("For interval plots, step and step_metric must be specified")
    results = {}
    for i in range(len(folders)):
        data = _load_data_from_subfolder(
            os.path.join(folders[i], algos[i]), metric[i], step[i], step_metric[i]
        )
        results.setdefault(algos[i], []).append(data)
    return {algo: np.array(v).T[0] for algo, v in results.items()}


def make_agg_metrics_pxy(folders, algos, metric, step=None, step_metric=None):
    """Pairwise matrices for probability-of-improvement plots
    (`stats.py:89-127`)."""
    agg = make_agg_metrics_intervals(folders, algos, metric, step, step_metric)
    out = {}
    for i in range(len(algos)):
        for j in range(len(algos)):
            if i == j:
                continue
            out[f"{algos[i]},{algos[j]}"] = (agg[algos[i]], agg[algos[j]])
    return out


def make_agg_metrics_efficiency(folders, algos, metric):
    """{algo: (n_runs, n_envs, n_steps)} sample-efficiency matrices
    (`stats.py:130-178`)."""
    results = {}
    for i in range(len(folders)):
        data = _load_data_from_subfolder(os.path.join(folders[i], algos[i]), metric[i])
        results.setdefault(algos[i], []).append(data)
    out = {}
    for algo, pulled in results.items():
        n_envs = len(pulled)
        n_runs = len(pulled[0])
        n_steps = min(len(r) for env_runs in pulled for r in env_runs)
        arr = np.array(
            [[run[:n_steps] for run in env_runs] for env_runs in pulled]
        )  # (n_envs, n_runs, n_steps)
        out[algo] = arr.transpose(1, 0, 2)
    return out
