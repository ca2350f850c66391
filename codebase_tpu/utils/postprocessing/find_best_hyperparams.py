"""Best hyperparameter group per env by mean metric.

Reference: `marlbase/utils/postprocessing/find_best_hyperparams.py:15-49`.
Usage: `python -m codebase_tpu.utils.postprocessing.find_best_hyperparams
--source outputs/ [--metric mean_episode_returns]`.
"""

from __future__ import annotations

from pathlib import Path

import click
import yaml

from codebase_tpu.utils.postprocessing.load_data import load_and_group_runs

DEFAULT_METRIC = "mean_episode_returns"


@click.command()
@click.option("--source", type=click.Path(dir_okay=True, writable=False), required=True)
@click.option("--metric", type=str, default=DEFAULT_METRIC)
def run(source, metric):
    groups = load_and_group_runs(Path(source))
    assert len(groups) > 0, "No groups found"
    assert all(g.has_metric(metric) for g in groups), f"Metric {metric} not found in all groups"

    for env in sorted({g.env_name for g in groups}):
        env_groups = [g for g in groups if g.env_name == env]
        best = max(env_groups, key=lambda g: g.get_metric(metric).mean())
        click.echo(
            "Best group for "
            + click.style(env, fg="red", bold=True)
            + " according to "
            + click.style(metric, fg="red", bold=True)
            + ": "
            + click.style(best.name, fg="red", bold=True)
        )
        click.echo(yaml.safe_dump(best.config, sort_keys=False))
        click.echo(85 * "-" + "\n")


if __name__ == "__main__":
    run()
