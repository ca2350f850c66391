"""Algorithm registry: name -> train entry point.

Replaces the reference's Hydra `_target_` string dispatch
(`configs/algorithm/idqn.yaml:4`, `run.py:38-45`) with an explicit mapping.
Every algorithm entry has signature `main(env, eval_env, logger, time_limit,
cfg, mesh=None) -> final_state` (mesh: optional data-parallel device mesh,
see `codebase_tpu/parallel/mesh.py`).

User algorithms (the reference's "Implementing your own algorithm" workflow,
`/root/reference/README.md:140-177`, where a copied folder is wired in via a
`_target_` string) plug in two ways:

- `register_algorithm("my_algo", entry_fn)` from user code before calling
  `run.main`, or
- `algorithm.entry=my_pkg.my_module:main` in the config — a dotted import
  path resolved at dispatch time (the explicit-opt-in equivalent of
  `_target_`), combined with an external preset file
  (`+algorithm=./path/to/my_algo.yaml`).
"""

from __future__ import annotations

import importlib


def _dqn(env, eval_env, logger, time_limit, cfg, mesh=None):
    from codebase_tpu.algos.dqn_train import main

    return main(env, eval_env, logger, time_limit, cfg, mesh=mesh)


def _ac(env, eval_env, logger, time_limit, cfg, mesh=None):
    from codebase_tpu.algos.ac_train import main

    return main(env, eval_env, logger, time_limit, cfg, mesh=mesh)


ALGORITHMS = {
    "idqn": _dqn,
    "vdn": _dqn,
    "qmix": _dqn,
    "ia2c": _ac,
    "maa2c": _ac,
    "ippo": _ac,
    "mappo": _ac,
}


def register_algorithm(name: str, entry) -> None:
    """Register (or override) an algorithm train entry point.

    `entry(env, eval_env, logger, time_limit, cfg, mesh=None)`."""
    ALGORITHMS[str(name)] = entry


def _import_entry(path: str):
    """Resolve `pkg.module:fn` (or `pkg.module.fn`) to a callable."""
    module_name, sep, attr = path.partition(":")
    if not sep:
        module_name, _, attr = path.rpartition(".")
    if not module_name or not attr:
        raise ValueError(
            f"algorithm.entry must look like 'pkg.module:fn'; got {path!r}"
        )
    return getattr(importlib.import_module(module_name), attr)


def get_algorithm(name: str, entry: str | None = None):
    """Look up a train entry point: explicit `algorithm.entry` dotted path
    wins, then the registry."""
    if entry:
        return _import_entry(str(entry))
    if name not in ALGORITHMS:
        raise ValueError(f"unknown algorithm {name!r}; available: {sorted(ALGORITHMS)}")
    return ALGORITHMS[name]
