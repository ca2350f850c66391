"""HiPlot experiment fetcher over exported multirun files.

Reference: `marlbase/utils/postprocessing/hiplot_fetcher.py:36-69`. Resolves
`exp://<export-file>/<env>/<alg>` URIs against an `export_multirun` HDF5 (or
pickle) file: per config-hash, the best mean-across-seeds performance becomes
one HiPlot row joined with that config's flattened hyperparameters.

Run with:
    hiplot codebase_tpu.utils.postprocessing.hiplot_fetcher.experiment_fetcher
and enter `exp://filename.h5/envname/alg` in the textbox. (hiplot is an
optional dependency.)
"""

from __future__ import annotations

import json
from collections import defaultdict

import numpy as np
import pandas as pd


class NumpyEncoder(json.JSONEncoder):
    """JSON encoder tolerating numpy scalar/array types."""

    def default(self, obj):
        if isinstance(obj, np.integer):
            return int(obj)
        if isinstance(obj, np.floating):
            return float(obj)
        if isinstance(obj, np.complexfloating):
            return {"real": obj.real, "imag": obj.imag}
        if isinstance(obj, np.ndarray):
            return obj.tolist()
        if isinstance(obj, np.bool_):
            return bool(obj)
        if isinstance(obj, np.void):
            return None
        return json.JSONEncoder.default(self, obj)


def _load_export(path):
    try:
        return pd.read_hdf(path, "df"), pd.read_hdf(path, "configs")
    except (ImportError, OSError):
        blob = pd.read_pickle(path)
        return blob["df"], blob["configs"]


def fetch_rows(export_file, env, alg):
    """Best-performance row per config hash for one (env, alg)."""
    df, configs = _load_export(export_file)
    # mean across seeds, then best value over training
    summary = df.T.groupby(level=[0, 1, 2]).mean().T.max()
    data = defaultdict(lambda: defaultdict(list))
    for env_name in summary.index.get_level_values(0).unique():
        env_df = summary.xs(env_name)
        for alg_name in env_df.index.get_level_values(0).unique():
            for h, perf in env_df.xs(alg_name).items():
                data[env_name][alg_name].append(
                    {**configs.loc[h].to_dict(), "performance": perf, "uid": h}
                )
    return json.loads(json.dumps(data[env][alg], cls=NumpyEncoder))


def experiment_fetcher(uri):
    import hiplot as hip

    PREFIX = "exp://"
    if not uri.startswith(PREFIX):
        raise hip.ExperimentFetcherDoesntApply()
    uri = uri[len(PREFIX) :]
    export_file, env, alg = uri.split("/")[0], uri.split("/")[1], uri.split("/")[2]
    return hip.Experiment.from_iterable(fetch_rows(export_file, env, alg))


if __name__ == "__main__":
    print('Run with "hiplot codebase_tpu.utils.postprocessing.hiplot_fetcher.experiment_fetcher"')
    print('And enter "exp://filename.h5/envname/alg" in the textbox')
