"""Vmapped multi-seed training: the TPU-native sweep engine.

The reference parallelises sweeps with a multiprocessing pool of `run.py`
subprocesses (`marlbase/search.py:108-120`) — one OS process per (config,
seed). Here the seed axis becomes a `jax.vmap` axis of the entire jitted
train chunk: N seeds train simultaneously in ONE XLA program on one chip
(BASELINE.md config 5: 32 seeds x batch-size grid of IDQN). Hyperparameters
that change shapes or static behaviour (batch size, architecture) become a
python loop of separately compiled programs; seeds vmap within each.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import List, Sequence

import numpy as np
import jax

from codebase_tpu.envs.factory import make_env
from codebase_tpu.utils.loggers import squash_info

log = logging.getLogger("codebase_tpu")

DQN_FAMILY = ("idqn", "vdn", "qmix")


def _build(cfg, env, eval_env, time_limit):
    if cfg.algorithm.name in DQN_FAMILY:
        from codebase_tpu.algos.dqn import build_train_functions
    else:
        from codebase_tpu.algos.ac import build_train_functions
    return build_train_functions(env, eval_env, cfg.algorithm, time_limit)


def run_vmapped_multiseed(cfg, seeds: Sequence[int], run_dir: Path) -> List[Path]:
    """Train one configuration under `len(seeds)` vmapped seeds at once.

    Writes one reference-compatible `results.csv` + `config.yaml` per seed
    under `run_dir/seed_<s>/` so the postprocessing tools treat each seed as
    an ordinary run. Returns the per-seed run dirs.
    """
    run_dir = Path(run_dir)
    env_cfg = cfg.env.to_dict()
    env_cfg.pop("parallel_envs", None)
    name = env_cfg.pop("name")
    env = make_env(name, **env_cfg)
    time_limit = int(cfg.env.time_limit)
    if "parallel_envs" in cfg.env:
        cfg.algorithm.parallel_envs = int(cfg.env.parallel_envs)

    model, init_state, train_chunk, evaluate = _build(cfg, env, env, time_limit)

    is_dqn = cfg.algorithm.name in DQN_FAMILY
    acfg = cfg.algorithm
    total_steps = int(acfg.total_steps)
    eval_interval = int(acfg.eval_interval) if acfg.eval_interval else 10_000
    n_envs = int(acfg.get("parallel_envs", 1))
    chunk_iters = min(max(1, eval_interval // (n_envs * time_limit)), 256)

    n_seeds = len(seeds)
    keys = jax.vmap(jax.random.PRNGKey)(np.asarray(seeds, np.uint32))
    states = jax.vmap(init_state)(keys)

    # multi-chip sweeps: shard the vmapped SEED axis over the data mesh —
    # each chip trains its own subset of seeds, zero communication
    from codebase_tpu.parallel.mesh import env_axis_sharding, mesh_from_config

    mesh = mesh_from_config(cfg.get("distributed"))
    if mesh is not None:
        assert n_seeds % mesh.size == 0, (
            f"number of seeds ({n_seeds}) must divide evenly over "
            f"{mesh.size} devices"
        )
        seed_sharding = env_axis_sharding(mesh)
        states = jax.device_put(states, jax.tree.map(lambda _: seed_sharding, states))

    vchunk = jax.vmap(train_chunk, in_axes=(0, None))
    vevaluate = jax.vmap(evaluate)

    # per-seed writers
    seed_dirs = []
    for s in seeds:
        d = run_dir / f"seed_{s}"
        d.mkdir(parents=True, exist_ok=True)
        seed_cfg = cfg.to_dict()
        seed_cfg["seed"] = int(s)
        import yaml

        (d / "config.yaml").write_text(yaml.safe_dump(seed_cfg, sort_keys=False))
        (d / "results.csv").write_text("")
        seed_dirs.append(d)

    def append_row(path: Path, d: dict):
        cols = ["environment_steps"] + sorted(k for k in d if k != "environment_steps")
        header = path.stat().st_size == 0
        with open(path, "a") as f:
            if header:
                f.write(",".join(cols) + "\n")
            f.write(",".join(repr(float(d[c])) if isinstance(d[c], float) else str(d[c]) for c in cols) + "\n")

    rng = jax.random.PRNGKey(max(seeds) + 1)
    last_eval = np.zeros(n_seeds)
    step = 0
    while step < total_steps + 1:
        states, metrics = vchunk(states, chunk_iters)
        env_steps = np.asarray(states.env_steps)
        step = int(env_steps.min())

        if (env_steps - last_eval).min() >= eval_interval:
            if is_dqn:
                rng, k = jax.random.split(rng)
                out = vevaluate(states.params, jax.random.split(k, n_seeds))
                returns = np.asarray(out["episode_returns"])  # (S, E, N)
                lengths = np.asarray(out["episode_lengths"])
            else:
                returns = np.asarray(metrics["episode_returns"])[:, -1]  # (S, E, N)
                lengths = np.asarray(metrics["episode_lengths"])[:, -1]
            losses = np.asarray(metrics["loss"])  # (S, iters)
            updates = np.asarray(states.updates)
            for si, d in enumerate(seed_dirs):
                infos = []
                for e in range(returns.shape[1]):
                    info = {
                        "episode_returns": returns[si, e],
                        "episode_length": float(lengths[si, e]),
                    }
                    for i in range(returns.shape[2]):
                        info[f"agent{i}/episode_returns"] = float(returns[si, e, i])
                    infos.append(info)
                extra = {"updates": int(updates[si]), "environment_steps": int(env_steps[si])}
                with np.errstate(all="ignore"):
                    if np.any(~np.isnan(losses[si])):
                        extra["loss"] = float(np.nanmean(losses[si]))
                infos.append(extra)
                append_row(d / "results.csv", squash_info(infos))
            last_eval = env_steps.copy()
            log.info(
                "sweep %s: steps ~%d, mean return %.4f",
                run_dir.name,
                step,
                float(returns.sum(-1).mean()),
            )
    return seed_dirs
