"""Algorithm registry: name -> train entry point.

Replaces the reference's Hydra `_target_` string dispatch
(`configs/algorithm/idqn.yaml:4`, `run.py:38-45`) with an explicit mapping.
Every algorithm entry has signature `main(env, eval_env, logger, time_limit,
cfg, mesh=None) -> final_state` (mesh: optional data-parallel device mesh,
see `codebase_tpu/parallel/mesh.py`).
"""

from __future__ import annotations


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


def get_algorithm(name: str):
    if name not in ALGORITHMS:
        raise ValueError(f"unknown algorithm {name!r}; available: {sorted(ALGORITHMS)}")
    return ALGORITHMS[name]
