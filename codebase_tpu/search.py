"""Hyperparameter sweep CLI.

Replaces `marlbase/search.py` with the same sweep-spec format and CLI shape
(`python -m codebase_tpu.search run --config sweeps/sample.yaml --seeds 5
<mode>`), plus a TPU-native `vmapped` mode that folds the seed axis into one
jitted program per configuration (see `codebase_tpu/sweep.py`).

Spec format (identical to the reference, `configs/sweeps/sample.yaml`):
- scalar values are constants,
- list values are grid axes (cartesian product),
- `!!python/tuple` entries link parameters (merged together; nested lists
  inside a tuple expand as further grid axes).

Modes:
- `dry_run`  — print the generated combination list (`search.py:123-131`),
- `single I` — run one combination, for cluster array jobs (`search.py:134-148`),
- `locally`  — run combinations as `run.py` invocations: sequential by
  default (a single TPU chip admits one process at a time), or a pool of
  `--workers N` subprocesses on CPU backends (the reference's
  multiprocessing pool, `search.py:108-120`),
- `vmapped`  — group combinations by config and train all seeds of each
  config simultaneously under vmap (TPU-native replacement).
"""

from __future__ import annotations

import logging
import random
from copy import deepcopy
from itertools import product
from pathlib import Path

import click
import yaml

log = logging.getLogger("codebase_tpu")


class _SweepLoader(yaml.SafeLoader):
    pass


def _tuple_constructor(loader, node):
    return tuple(loader.construct_sequence(node))


_SweepLoader.add_constructor("tag:yaml.org,2002:python/tuple", _tuple_constructor)


def _flatten_lists(obj):
    for item in obj:
        if isinstance(item, (list, tuple, set)):
            yield from _flatten_lists(item)
        else:
            yield item


def gen_combos(config: dict, built: dict | None = None):
    """Cartesian expansion with tuple-linked params (`search.py:38-64`)."""
    built = deepcopy(built or {})
    if not config:
        return [[f"{k}={v}" for k, v in built.items()]]
    k, v = next(iter(config.items()))
    combos = []
    if isinstance(v, list):
        for item in v:
            new = deepcopy(config)
            del new[k]
            new[k] = item
            combos += gen_combos(new, built)
    elif isinstance(v, tuple):
        new = deepcopy(config)
        del new[k]
        for item in v:
            new.update(item)
        combos += gen_combos(new, built)
    else:
        new = deepcopy(config)
        del new[k]
        built[k] = v
        combos += gen_combos(new, built)
    return combos


def seed_and_shuffle(combos, shuffle: bool, seeds: int):
    """Tag hypergroups, cross with seeds, deterministic shuffle
    (`search.py:22-30`)."""
    combos = [[f"+hypergroup=hp_grp_{i}"] + c for i, c in enumerate(combos)]
    combos = list(product(combos, [f"seed={i}" for i in range(seeds)]))
    combos = [list(_flatten_lists(c)) for c in combos]
    if shuffle:
        random.Random(1337).shuffle(combos)
    return combos


@click.group()
def cli():
    pass


@cli.group()
@click.option("--config", type=click.File(), default="config.yaml")
@click.option("--shuffle/--no-shuffle", default=True)
@click.option("--seeds", default=3, show_default=True, help="How many seeds to run")
@click.pass_context
def run(ctx, config, shuffle, seeds):
    spec = yaml.load(config, Loader=_SweepLoader)
    combos = gen_combos(spec)
    combos = seed_and_shuffle(combos, shuffle, seeds)
    if not combos:
        click.echo("No valid combinations. Aborted!")
        raise SystemExit(1)
    ctx.obj = combos


@run.command()
@click.pass_obj
def dry_run(combos):
    click.echo(f"There are {len(combos)} configurations as shown below:")
    for c in combos:
        click.echo(" ".join(c))


@run.command()
@click.argument("index", type=int)
@click.pass_obj
def single(combos, index):
    """Run one combination by INDEX (cluster array jobs)."""
    from codebase_tpu.run import main as run_main

    tokens = [t for t in combos[index]]
    click.echo(" ".join(tokens))
    run_main(tokens)


@run.command()
@click.option("--yes", is_flag=True, help="skip confirmation")
@click.option(
    "--workers",
    default=1,
    show_default=True,
    help="concurrent run.py subprocesses (the reference's process pool, "
    "search.py:108-120). Keep 1 on a TPU chip — the chip admits one process "
    "at a time; >1 is for CPU backends and shape-changing axes that cannot "
    "fold into `vmapped`.",
)
@click.pass_obj
def locally(combos, yes, workers):
    """Run every combination locally: sequentially in-process by default,
    or as a pool of `--workers` run.py subprocesses."""
    if not yes:
        click.confirm(
            f"Run {len(combos)} combinations "
            + (f"with {workers} workers?" if workers > 1 else "sequentially?"),
            abort=True,
        )
    if workers <= 1:
        from codebase_tpu.run import main as run_main

        for i, tokens in enumerate(combos):
            click.echo(f"[{i + 1}/{len(combos)}] " + " ".join(tokens))
            run_main(list(tokens))
        return

    import subprocess
    import sys
    from concurrent.futures import ThreadPoolExecutor

    def work(i_tokens):
        i, tokens = i_tokens
        click.echo(f"[{i + 1}/{len(combos)}] " + " ".join(tokens))
        proc = subprocess.run(
            [sys.executable, "-m", "codebase_tpu.run", *tokens],
            capture_output=True,
            text=True,
        )
        if proc.returncode != 0:
            click.echo(
                f"[{i + 1}/{len(combos)}] FAILED rc={proc.returncode}\n"
                + proc.stderr[-2000:],
                err=True,
            )
        return proc.returncode

    # threads only marshal subprocesses; each run gets its own JAX runtime
    with ThreadPoolExecutor(max_workers=workers) as pool:
        codes = list(pool.map(work, enumerate(combos)))
    failed = sum(1 for c in codes if c != 0)
    click.echo(f"done: {len(codes) - failed}/{len(codes)} succeeded")
    if failed:
        raise SystemExit(1)


@run.command()
@click.option("--output", default="sweeps_out", show_default=True)
@click.option("--yes", is_flag=True, help="skip confirmation")
@click.pass_obj
def vmapped(combos, output, yes):
    """Fold sweep axes into vmapped programs (TPU-native sweep).

    Seeds always vmap. Grid axes on scalar non-shape-changing
    hyperparameters (`sweep.VMAPPABLE_KEYS`: lr, gamma, tau) fold into the
    SAME vmap, so e.g. an lr grid x seeds trains every combination in one
    compiled program. Axes that change shapes/static structure remain a
    python loop of separately compiled groups."""
    from codebase_tpu.config import load_config
    from codebase_tpu.sweep import VMAPPABLE_KEYS, run_vmapped_multiseed
    from codebase_tpu.utils.compilation_cache import enable as enable_cache

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
    enable_cache()

    # group by the residual config (vmappable assignments stripped); each
    # group carries its list of hyper-variants and the seed set
    groups: dict[tuple, dict] = {}
    for tokens in combos:
        seed = int(next(t.split("=")[1] for t in tokens if t.startswith("seed=")))
        base = [t for t in tokens if not t.startswith(("seed=", "+hypergroup"))]
        variant = {}
        residual = []
        for t in base:
            k, _, v = t.partition("=")
            if k in VMAPPABLE_KEYS:
                variant[VMAPPABLE_KEYS[k]] = float(v)
            else:
                residual.append(t)
        g = groups.setdefault(
            tuple(sorted(residual)),
            {"tokens": residual, "variants": [], "seeds": set()},
        )
        if variant not in g["variants"]:
            g["variants"].append(variant)
        g["seeds"].add(seed)

    n_units = sum(len(g["variants"]) * len(g["seeds"]) for g in groups.values())
    if not yes:
        click.confirm(
            f"Run {len(groups)} compiled group(s) covering {n_units} vmapped "
            "(variant x seed) units?",
            abort=True,
        )
    for i, (_, info) in enumerate(sorted(groups.items())):
        cfg = load_config(info["tokens"])
        variants = info["variants"] if any(info["variants"]) else None
        click.echo(
            f"group_{i}: {' '.join(info['tokens'])} "
            f"(variants {variants or '[default]'}, seeds {sorted(info['seeds'])})"
        )
        run_vmapped_multiseed(
            cfg,
            sorted(info["seeds"]),
            Path(output) / f"group_{i}",
            hyper_variants=variants,
        )


@run.command()
@click.option("--output", default="sweeps_out", show_default=True)
@click.option("--budget", default=10, show_default=True, help="number of configurations to evaluate")
@click.option("--metric", default="mean_episode_returns", show_default=True)
@click.option("--tail", default=5, show_default=True, help="final results.csv rows averaged into the objective")
@click.option("--bo-seed", default=0, show_default=True)
@click.option("--yes", is_flag=True, help="skip confirmation")
@click.pass_obj
def bayes(combos, output, budget, metric, tail, bo_seed, yes):
    """Bayesian optimisation over the sweep spec (GP + expected improvement).

    The reference's equivalent is the hydra-ax-sweeper backend
    (`requirements.txt:10`). Candidates are the spec's grid; instead of
    exhausting it, a Gaussian process proposes the next configuration and
    stops at --budget evaluations. Each evaluation trains ALL seeds of the
    configuration vmapped in one program; the objective is the seed-mean of
    the final `--metric` (tail-averaged)."""
    import json

    import numpy as np

    from codebase_tpu.bayes import optimise
    from codebase_tpu.config import load_config
    from codebase_tpu.sweep import run_vmapped_multiseed
    from codebase_tpu.utils.compilation_cache import enable as enable_cache

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
    enable_cache()

    # a spec with no seed axis still evaluates: default to one seed
    seeds = sorted(
        {int(t.split("=")[1]) for c in combos for t in c if t.startswith("seed=")}
    ) or [0]
    combo_dicts = {}
    for tokens in combos:
        d = {}
        for t in tokens:
            if t.startswith(("seed=", "+hypergroup")):
                continue
            k, _, v = t.partition("=")
            d[k] = v
        combo_dicts[tuple(sorted(d.items()))] = d
    candidates = list(combo_dicts.values())
    keys = sorted({k for c in candidates for k in c})
    # tuple-linked specs produce heterogeneous key sets (a key present in
    # only some combos): absence is itself a categorical level, not a KeyError
    axes = {}
    for k in keys:
        vals = {c.get(k, _ABSENT) for c in candidates}
        if len(vals) > 1:
            axes[k] = sorted(vals, key=_axis_sort_key)
    # typed axes for the encoder (numeric strings -> floats)
    axes_typed = {k: [_parse_scalar(v) for v in vs] for k, vs in axes.items()}

    if not yes:
        click.confirm(
            f"Bayesian-optimise over {len(candidates)} candidates "
            f"({budget} evaluations x {len(seeds)} vmapped seeds)?",
            abort=True,
        )

    out_root = Path(output)
    trial = {"i": 0}

    def evaluate(combo):
        import pandas as pd

        trial["i"] += 1
        tokens = [f"{k}={v}" for k, v in combo.items()]
        cfg = load_config(tokens)
        d = out_root / f"trial_{trial['i']:03d}"
        click.echo(f"[bayes {trial['i']}/{budget}] {' '.join(tokens)}")
        dirs = run_vmapped_multiseed(cfg, seeds, d)
        finals = []
        for sd in dirs:
            df = pd.read_csv(sd / "results.csv")
            vals = df[metric].dropna()
            finals.append(float(vals.tail(tail).mean()))
        y = float(np.mean(finals))
        click.echo(f"[bayes {trial['i']}/{budget}] objective {y:.4f}")
        return y

    # only the varying axes feed the GP; constants ride along in evaluate
    bo_candidates = [
        {k: _parse_scalar(c.get(k, _ABSENT)) for k in axes} for c in candidates
    ]
    raw_by_enc = {tuple(sorted(b.items())): c for b, c in zip(bo_candidates, candidates)}

    result = optimise(
        bo_candidates,
        axes_typed,
        lambda b: evaluate(raw_by_enc[tuple(sorted(b.items()))]),
        budget,
        seed=bo_seed,
    )
    summary = {
        "best": raw_by_enc[tuple(sorted(result["best"].items()))],
        "best_value": result["best_value"],
        "evaluations": len(result["history"]),
        "candidates": len(candidates),
        "metric": metric,
    }
    out_root.mkdir(parents=True, exist_ok=True)
    (out_root / "bayes_result.json").write_text(json.dumps(summary, indent=2))
    click.echo(json.dumps(summary))


# categorical level standing for "key not present in this combo" (tuple-linked
# sweep specs legitimately produce such holes); _parse_scalar passes it through
# as a string, so the GP encoder one-hots the axis
_ABSENT = "<absent>"


def _parse_scalar(v: str):
    try:
        f = float(v)
        return int(f) if f.is_integer() and "." not in str(v) and "e" not in str(v).lower() else f
    except (TypeError, ValueError):
        return v


def _axis_sort_key(v):
    p = _parse_scalar(v)
    return (0, p, "") if isinstance(p, (int, float)) else (1, 0, str(p))


if __name__ == "__main__":
    cli()
