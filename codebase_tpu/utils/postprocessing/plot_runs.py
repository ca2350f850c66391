"""Mean +- std learning-curve plots per environment.

Reference: `marlbase/utils/postprocessing/plot_runs.py:18-57`.
Usage: `python -m codebase_tpu.utils.postprocessing.plot_runs
--source outputs/ [--metric mean_episode_returns] [--save_path plots/]`.
"""

from __future__ import annotations

from pathlib import Path

import click

from codebase_tpu.utils.postprocessing.load_data import load_and_group_runs

DEFAULT_METRIC = "mean_episode_returns"


@click.command()
@click.option("--source", type=click.Path(dir_okay=True, writable=False), required=True)
@click.option("--minimal-name", type=bool, default=True)
@click.option("--metric", type=str, default=DEFAULT_METRIC)
@click.option("--save_path", type=click.Path(dir_okay=True, writable=True))
@click.option("--show/--no-show", default=True)
def run(source, minimal_name, metric, save_path, show):
    import matplotlib

    if not show:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import seaborn as sns

    groups = load_and_group_runs(Path(source), minimal_name)
    assert len(groups) > 0, "No groups found"
    click.echo(f"Loaded {len(groups)} groups:")
    for g in groups:
        click.echo(f"\t{g.name} with {len(g.runs)} runs")
    assert all(g.has_metric(metric) for g in groups), f"Metric {metric} not found in all groups"

    for env in sorted({g.env_name for g in groups}):
        env_groups = [g for g in groups if g.env_name == env]
        sns.set_style("whitegrid")
        plt.figure()
        for g in env_groups:
            steps = g.get_metric("environment_steps").mean(axis=0)
            values = g.get_metric(metric)
            means, stds = values.mean(axis=0), values.std(axis=0)
            plt.plot(steps, means, label=g.name)
            plt.fill_between(steps, means - stds, means + stds, alpha=0.3)
        plt.legend()
        plt.xlabel("Environment steps")
        plt.ylabel(metric)
        plt.title(env)
        if save_path:
            out = Path(save_path) / f"{env.replace('/', ':')}_{metric}.pdf"
            out.parent.mkdir(parents=True, exist_ok=True)
            plt.savefig(out)
        if show:
            plt.show()


if __name__ == "__main__":
    run()
