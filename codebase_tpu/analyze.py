"""Post-hoc analysis CLI over run directories: `summary`, `best`, `plot`.

One command with subcommands replaces the reference's pair of standalone
scripts (`marlbase/utils/postprocessing/{find_best_hyperparams,plot_runs}.py`)
while staying fully compatible with the same on-disk contract: a tree of run
dirs each holding `config.yaml` + `results.csv` (grouped by seed-excluded
config via `codebase_tpu/utils/postprocessing/load_data.py`).

Usage:
    python -m codebase_tpu.analyze summary --source outputs/
    python -m codebase_tpu.analyze best    --source outputs/ [--last-k 5]
    python -m codebase_tpu.analyze plot    --source outputs/ --save-dir plots/

Beyond the reference: `summary` (per-group final mean±std table at a glance)
and `best --last-k` (rank by the mean of the last K eval points rather than
the whole-curve mean, which rewards fast-but-collapsing runs).
"""

from __future__ import annotations

from pathlib import Path

import click

DEFAULT_METRIC = "mean_episode_returns"


def _load_groups(source, metric, minimal_name=True):
    from codebase_tpu.utils.postprocessing.load_data import load_and_group_runs

    groups = load_and_group_runs(Path(source), minimal_name)
    if not groups:
        raise click.ClickException(f"no runs found under {source}")
    missing = [g.name for g in groups if not g.has_metric(metric)]
    if missing:
        raise click.ClickException(
            f"metric {metric!r} missing from groups: {', '.join(missing)}"
        )
    return groups


def _by_env(groups):
    envs = sorted({g.env_name for g in groups})
    return [(env, [g for g in groups if g.env_name == env]) for env in envs]


def _tail_score(group, metric, last_k):
    values = group.get_metric(metric)  # (runs, points)
    k = min(last_k, values.shape[1]) if last_k else values.shape[1]
    return values[:, -k:].mean()


@click.group()
def cli():
    """Analyse training runs (results.csv trees)."""


@cli.command()
@click.option("--source", required=True, type=click.Path(exists=True))
@click.option("--metric", default=DEFAULT_METRIC, show_default=True)
@click.option("--last-k", default=5, show_default=True,
              help="final score = mean of the last K eval points")
def summary(source, metric, last_k):
    """Per-group table: runs, curve mean, final mean±std."""
    groups = _load_groups(source, metric)
    for env, env_groups in _by_env(groups):
        click.secho(f"{env}", bold=True)
        rows = []
        for g in sorted(env_groups, key=lambda g: -_tail_score(g, metric, last_k)):
            values = g.get_metric(metric)
            tail = values[:, -min(last_k, values.shape[1]):]
            rows.append((
                g.name,
                f"{len(g.runs)}",
                f"{values.mean():.4g}",
                f"{tail.mean():.4g} ± {tail.mean(axis=1).std():.3g}",
            ))
        widths = [max(len(r[i]) for r in rows) for i in range(4)]
        header = ("group", "runs", f"curve {metric}", f"final[{last_k}] ± std(seeds)")
        widths = [max(w, len(h)) for w, h in zip(widths, header)]
        fmt = "  ".join("{:<%d}" % w for w in widths)
        click.echo("  " + fmt.format(*header))
        for r in rows:
            click.echo("  " + fmt.format(*r))
        click.echo()


@cli.command()
@click.option("--source", required=True, type=click.Path(exists=True))
@click.option("--metric", default=DEFAULT_METRIC, show_default=True)
@click.option("--last-k", default=0, show_default=True,
              help="rank by mean of last K points (0 = whole curve, as the reference ranks)")
@click.option("--print-config/--no-print-config", default=True, show_default=True)
def best(source, metric, last_k, print_config):
    """Best hyperparameter group per environment."""
    import yaml

    groups = _load_groups(source, metric)
    for env, env_groups in _by_env(groups):
        winner = max(env_groups, key=lambda g: _tail_score(g, metric, last_k))
        score = _tail_score(winner, metric, last_k)
        click.echo(
            f"{click.style(env, bold=True)}: "
            f"{click.style(winner.name, fg='green')} "
            f"({metric}={score:.4g} over {len(winner.runs)} runs)"
        )
        if print_config:
            click.echo(yaml.safe_dump(winner.config, sort_keys=False))


def plot_env(env, env_groups, metric, ax=None):
    """Mean ± std learning curves for one environment onto `ax`.

    Importable (not just a CLI leaf) so notebooks/tests can compose figures.
    """
    import matplotlib.pyplot as plt

    if ax is None:
        _, ax = plt.subplots()
    for g in env_groups:
        steps = g.get_metric("environment_steps").mean(axis=0)
        values = g.get_metric(metric)
        mean, std = values.mean(axis=0), values.std(axis=0)
        ax.plot(steps, mean, label=g.name)
        ax.fill_between(steps, mean - std, mean + std, alpha=0.3)
    ax.set_xlabel("environment steps")
    ax.set_ylabel(metric)
    ax.set_title(env)
    ax.legend()
    return ax


@cli.command("plot")
@click.option("--source", required=True, type=click.Path(exists=True))
@click.option("--metric", default=DEFAULT_METRIC, show_default=True)
@click.option("--save-dir", type=click.Path(), default=None,
              help="write one <env>_<metric>.pdf per environment")
@click.option("--show/--no-show", default=False, show_default=True)
@click.option("--minimal-name/--full-name", default=True, show_default=True)
def plot_cmd(source, metric, save_dir, show, minimal_name):
    """Mean ± std learning-curve plots per environment."""
    import matplotlib

    if not show:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    groups = _load_groups(source, metric, minimal_name)
    for env, env_groups in _by_env(groups):
        fig, ax = plt.subplots()
        plot_env(env, env_groups, metric, ax=ax)
        if save_dir:
            out = Path(save_dir) / f"{env.replace('/', ':')}_{metric}.pdf"
            out.parent.mkdir(parents=True, exist_ok=True)
            fig.savefig(out)
            click.echo(f"wrote {out}")
    if show:
        plt.show()


if __name__ == "__main__":
    cli()
