"""Vmapped multi-seed / multi-hyperparameter training: the TPU-native sweep
engine.

The reference parallelises sweeps with a multiprocessing pool of `run.py`
subprocesses (`marlbase/search.py:108-120`) — one OS process per (config,
seed). Here the sweep axes become ONE `jax.vmap` axis of the entire jitted
train chunk (SURVEY.md §2 "vmap over seed/hyperparam axes"):

- the seed axis always vmaps (BASELINE.md config 5: 32 seeds of IDQN in one
  XLA program on one chip);
- scalar hyperparameters that change neither shapes nor static behaviour —
  learning rate, gamma, and the target-update tau (within one hard/soft
  regime) — vmap too, via traced `hyper` scalars in the train state
  (`algos/dqn.py`/`algos/ac.py` `dynamic_hypers`; lr rides in the optimizer
  state through `optax.inject_hyperparams`);
- hyperparameters that change shapes or static structure (batch size,
  architecture, parallel_envs) stay a python loop of separately compiled
  programs; the vmappable axes fold within each.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np
import jax

from codebase_tpu.envs.factory import make_env
from codebase_tpu.utils.loggers import squash_info

log = logging.getLogger("codebase_tpu")

DQN_FAMILY = ("idqn", "vdn", "qmix")

# config dot-paths whose scalar values can fold into the vmap axis
VMAPPABLE_KEYS = {
    "algorithm.lr": "lr",
    "algorithm.gamma": "gamma",
    "algorithm.target_update_interval_or_tau": "tau",
}


def _build(cfg, env, eval_env, time_limit, dynamic_hypers=()):
    if cfg.algorithm.name in DQN_FAMILY:
        from codebase_tpu.algos.dqn import build_train_functions
    else:
        from codebase_tpu.algos.ac import build_train_functions
    return build_train_functions(
        env, eval_env, cfg.algorithm, time_limit, dynamic_hypers=dynamic_hypers
    )


def _variant_label(variant: Dict[str, float]) -> str:
    return ",".join(f"{k}={v:g}" for k, v in sorted(variant.items()))


def run_vmapped_multiseed(
    cfg,
    seeds: Sequence[int],
    run_dir: Path,
    hyper_variants: Optional[List[Dict[str, float]]] = None,
) -> List[Path]:
    """Train one configuration under vmapped (hyper-variant x seed) units.

    `hyper_variants` is a list of {"lr"/"gamma"/"tau": value} dicts; None
    trains just the seed axis. All units run simultaneously in one compiled
    program. Writes one reference-compatible `results.csv` + `config.yaml`
    per unit (under `run_dir[/variant]/seed_<s>/`) so the postprocessing
    tools treat each unit as an ordinary run. Returns the unit run dirs.
    """
    run_dir = Path(run_dir)
    env_cfg = cfg.env.to_dict()
    env_cfg.pop("parallel_envs", None)
    name = env_cfg.pop("name")
    env = make_env(name, **env_cfg)
    time_limit = int(cfg.env.time_limit)
    if "parallel_envs" in cfg.env:
        cfg.algorithm.parallel_envs = int(cfg.env.parallel_envs)

    variants = hyper_variants or [{}]
    dyn = tuple(sorted({k for v in variants for k in v}))
    assert set(dyn) <= {"lr", "gamma", "tau"}, dyn
    if "tau" in dyn:
        default_tau = float(cfg.algorithm.target_update_interval_or_tau)
        taus = [v.get("tau", default_tau) for v in variants]
        assert all((t > 1.0) == (default_tau > 1.0) for t in taus), (
            "swept tau values must share one regime (all hard-update "
            "intervals > 1 or all Polyak factors < 1); the hard/soft branch "
            f"is static: got {taus} with default {default_tau}"
        )

    model, init_state, train_chunk, evaluate = _build(
        cfg, env, env, time_limit, dynamic_hypers=dyn
    )

    is_dqn = cfg.algorithm.name in DQN_FAMILY
    acfg = cfg.algorithm
    total_steps = int(acfg.total_steps)
    eval_interval = int(acfg.eval_interval) if acfg.eval_interval else 10_000
    n_envs = int(acfg.get("parallel_envs", 1))
    chunk_iters = min(max(1, eval_interval // (n_envs * time_limit)), 256)

    # flat unit axis: variant-major, seed-minor
    units = [(vi, s) for vi in range(len(variants)) for s in seeds]
    n_units = len(units)
    keys = jax.vmap(jax.random.PRNGKey)(
        np.asarray([s for _, s in units], np.uint32)
    )
    if dyn:
        defaults = {
            "lr": float(acfg.lr),
            "gamma": float(acfg.gamma),
            "tau": float(acfg.target_update_interval_or_tau),
        }
        hyper_stack = {
            k: np.asarray(
                [variants[vi].get(k, defaults[k]) for vi, _ in units], np.float32
            )
            for k in dyn
        }
        states = jax.vmap(init_state)(keys, hyper_stack)
    else:
        states = jax.vmap(init_state)(keys)

    # multi-chip sweeps: shard the vmapped UNIT axis over the data mesh —
    # each chip trains its own subset of units, zero communication
    from codebase_tpu.parallel.mesh import env_axis_sharding, mesh_from_config

    mesh = mesh_from_config(cfg.get("distributed"))
    if mesh is not None:
        assert n_units % mesh.size == 0, (
            f"number of (variant x seed) units ({n_units}) must divide "
            f"evenly over {mesh.size} devices"
        )
        unit_sharding = env_axis_sharding(mesh)
        states = jax.device_put(states, jax.tree.map(lambda _: unit_sharding, states))

    vchunk = jax.vmap(train_chunk, in_axes=(0, None))
    vevaluate = jax.vmap(evaluate)

    # per-unit writers
    unit_dirs = []
    for vi, s in units:
        d = run_dir
        if variants != [{}]:
            d = d / _variant_label(variants[vi])
        d = d / f"seed_{s}"
        d.mkdir(parents=True, exist_ok=True)
        unit_cfg = cfg.to_dict()
        unit_cfg["seed"] = int(s)
        for path, short in VMAPPABLE_KEYS.items():
            if short in variants[vi]:
                node, leaf = path.split(".")
                unit_cfg[node][leaf] = float(variants[vi][short])
        import yaml

        (d / "config.yaml").write_text(yaml.safe_dump(unit_cfg, sort_keys=False))
        (d / "results.csv").write_text("")
        unit_dirs.append(d)

    def append_row(path: Path, d: dict):
        cols = ["environment_steps"] + sorted(k for k in d if k != "environment_steps")
        header = path.stat().st_size == 0
        with open(path, "a") as f:
            if header:
                f.write(",".join(cols) + "\n")
            f.write(",".join(repr(float(d[c])) if isinstance(d[c], float) else str(d[c]) for c in cols) + "\n")

    rng = jax.random.PRNGKey(max(seeds) + 1)
    last_eval = np.zeros(n_units)
    step = 0
    while step < total_steps + 1:
        states, metrics = vchunk(states, chunk_iters)
        env_steps = np.asarray(states.env_steps)
        step = int(env_steps.min())

        if (env_steps - last_eval).min() >= eval_interval:
            if is_dqn:
                rng, k = jax.random.split(rng)
                out = vevaluate(states.params, jax.random.split(k, n_units))
                returns = np.asarray(out["episode_returns"])  # (U, E, N)
                lengths = np.asarray(out["episode_lengths"])
            else:
                returns = np.asarray(metrics["episode_returns"])[:, -1]  # (U, E, N)
                lengths = np.asarray(metrics["episode_lengths"])[:, -1]
            losses = np.asarray(metrics["loss"])  # (U, iters)
            updates = np.asarray(states.updates)
            for ui, d in enumerate(unit_dirs):
                infos = []
                for e in range(returns.shape[1]):
                    info = {
                        "episode_returns": returns[ui, e],
                        "episode_length": float(lengths[ui, e]),
                    }
                    for i in range(returns.shape[2]):
                        info[f"agent{i}/episode_returns"] = float(returns[ui, e, i])
                    infos.append(info)
                extra = {"updates": int(updates[ui]), "environment_steps": int(env_steps[ui])}
                with np.errstate(all="ignore"):
                    if np.any(~np.isnan(losses[ui])):
                        extra["loss"] = float(np.nanmean(losses[ui]))
                infos.append(extra)
                append_row(d / "results.csv", squash_info(infos))
            last_eval = env_steps.copy()
            log.info(
                "sweep %s: %d units, steps ~%d, mean return %.4f",
                run_dir.name,
                n_units,
                step,
                float(returns.sum(-1).mean()),
            )
    return unit_dirs
