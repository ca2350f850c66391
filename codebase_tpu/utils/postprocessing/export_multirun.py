"""Export a multirun tree to a single multi-indexed dataframe.

Reference: `marlbase/utils/postprocessing/export_multirun.py:12-81`: builds a
(env, algo, config-hash, seed) column-multi-indexed dataframe of
`mean_episode_returns` plus a config-hash lookup table, written to HDF5
(or pickle when pytables is unavailable).
"""

from __future__ import annotations

import json
from collections import defaultdict
from hashlib import sha256
from pathlib import Path

import click
import pandas as pd
import yaml


def load_multirun(folder) -> tuple[pd.DataFrame, pd.DataFrame]:
    path = Path(folder)
    data = defaultdict(lambda: defaultdict(lambda: defaultdict(list)))
    seen_seeds = defaultdict(set)
    hash_to_config = {}

    for results in sorted(path.glob("**/results.csv")):
        config_path = results.parent / "config.yaml"
        if not config_path.exists():
            continue
        config = yaml.safe_load(config_path.read_text())
        env = config["env"]["name"].split(":")[-1]
        algo = config["algorithm"]["name"]
        seed = config.get("seed")
        cfg_wo_seed = {k: v for k, v in config.items() if k != "seed"}
        h = sha256(json.dumps(cfg_wo_seed, sort_keys=True, default=str).encode()).hexdigest()[:12]
        hash_to_config[h] = pd.json_normalize(cfg_wo_seed)

        series = pd.read_csv(results, index_col=0)["mean_episode_returns"]
        assert seed not in seen_seeds[(env, algo, h)], f"Duplicate seed in {results}"
        seen_seeds[(env, algo, h)].add(seed)
        data[env][algo][h].append(series.rename(f"seed={seed}"))

    env_frames = []
    for env in data:
        algo_frames = []
        for algo in data[env]:
            hash_frames = [pd.concat(data[env][algo][h], axis=1) for h in data[env][algo]]
            algo_frames.append(pd.concat(hash_frames, axis=1, keys=list(data[env][algo])))
        env_frames.append(pd.concat(algo_frames, axis=1, keys=list(data[env])))
    df = pd.concat(env_frames, axis=1, keys=list(data))
    configs = pd.concat(hash_to_config).droplevel(1)
    return configs, df


@click.command()
@click.option("--folder", type=click.Path(exists=True), default="outputs/")
@click.option("--export-file", type=click.Path(dir_okay=False, writable=True), required=True)
def run(folder, export_file):
    hash_to_config, df = load_multirun(folder)
    try:
        df.to_hdf(export_file, key="df", mode="w", complevel=9)
        hash_to_config.to_hdf(export_file, key="configs")
    except ImportError:
        out = Path(export_file).with_suffix(".pkl")
        pd.to_pickle({"df": df, "configs": hash_to_config}, out)
        click.echo(f"pytables unavailable; wrote pickle to {out}")


if __name__ == "__main__":
    run()
