"""Train CLI — `python -m codebase_tpu.run +algorithm=idqn env.name=... env.time_limit=25`.

Replaces `marlbase/run.py` (Hydra entry): same override surface
(README.md:76-93), explicit registry dispatch instead of `_target_` strings,
run directories `outputs/{env.name}/{algorithm.name}/{hash}` where hash is a
random 8-hex tag (the reference's `${random:4}` resolver, `run.py:8-11`).
"""

from __future__ import annotations

import logging
import os
import sys
from pathlib import Path

from codebase_tpu.algos.registry import get_algorithm
from codebase_tpu.config import load_config
from codebase_tpu.envs.factory import make_env
from codebase_tpu.utils.loggers import make_logger


def build_envs(cfg):
    """Build the train env spec and a single-instance eval env spec
    (the reference strips `parallel_envs` for eval, `run.py:21-27`)."""
    env_cfg = cfg.env.to_dict() if hasattr(cfg.env, "to_dict") else dict(cfg.env)
    env_cfg.pop("parallel_envs", None)
    name = env_cfg.pop("name")
    env = make_env(name, **env_cfg)
    return env, env  # specs are pure; the same spec serves train and eval


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
    from codebase_tpu.utils.compilation_cache import enable as enable_cache

    enable_cache()
    cfg = load_config(argv if argv is not None else sys.argv[1:])

    assert cfg.env.get("name"), "env.name must be set"
    assert cfg.env.get("time_limit"), "Time limit must be set."
    assert "name" in cfg.algorithm, "select an algorithm with +algorithm=<name>"

    if cfg.get("debug"):
        # SURVEY.md §5 sanitizer mode: located NaN errors from any jit output
        # (plus the drivers build a checkified train chunk). Slow by design.
        from codebase_tpu.utils.debug import enable_debug_nans

        enable_debug_nans()
        logging.getLogger("codebase_tpu").warning(
            "debug=true: jax_debug_nans + checkified train chunk enabled "
            "(expect several-fold slower steps)"
        )

    # bring up the multi-host runtime FIRST: process identity decides who owns
    # the run directory and logger below (N hosts must not race on one
    # results.csv), and the mesh must span the global device set
    from codebase_tpu.parallel.mesh import is_coordinator, mesh_from_config

    dist_cfg = cfg.get("distributed")
    if dist_cfg is not None:
        from codebase_tpu.parallel.mesh import maybe_initialize_distributed

        maybe_initialize_distributed(dist_cfg.get("initialize", "auto"))

    run_dir = cfg.get("run_dir")
    if not run_dir:
        tag = os.urandom(4).hex()
        run_dir = Path("outputs") / str(cfg.env.name).replace(":", "_") / cfg.algorithm.name / tag
    run_dir = Path(run_dir)

    if is_coordinator():
        run_dir.mkdir(parents=True, exist_ok=True)
        logger = make_logger(cfg, run_dir)
    else:
        # non-coordinator hosts keep a console-only logger: no results.csv,
        # config.yaml, checkpoint or video writes (those race across hosts)
        from codebase_tpu.utils.loggers import Logger

        logger = Logger(cfg.get("project_name", "codebase_tpu"), cfg, run_dir)
    env, eval_env = build_envs(cfg)

    if cfg.get("seed") is None:
        logger.warning("No seed has been set.")

    # move parallel_envs into the algorithm node (rollout width)
    if "parallel_envs" in cfg.env:
        cfg.algorithm.parallel_envs = int(cfg.env.parallel_envs)

    # data-parallel mesh (distributed.devices=N|all); single-device when unset
    mesh = mesh_from_config(dist_cfg)

    algo = get_algorithm(cfg.algorithm.name, entry=cfg.algorithm.get("entry"))
    trace_dir = cfg.get("trace_dir")
    if trace_dir:
        from codebase_tpu.utils.profiling import trace

        logger.info(f"Capturing profiler trace to {trace_dir}")
        with trace(trace_dir):
            algo(env, eval_env, logger, int(cfg.env.time_limit), cfg, mesh=mesh)
    else:
        algo(env, eval_env, logger, int(cfg.env.time_limit), cfg, mesh=mesh)
    return logger.get_state()


if __name__ == "__main__":
    main()
