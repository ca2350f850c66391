"""Round-4 SMAClite lane profile: split the qmix_smaclite_3m iteration cost
into rollout-only vs full (rollout + 8 updates) so the update-path share is
measured, not inferred (VERDICT r3 weak #3: no post-fix profile recorded).

Usage:  python scripts/diag/smaclite_lane_profile.py [--iters 8] [--envs 16384]
Prints one JSON line.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax

from codebase_tpu.algos.dqn import build_train_functions
from codebase_tpu.config import load_config
from codebase_tpu.envs.factory import make_env
from codebase_tpu.utils import profiling
from codebase_tpu.utils.compilation_cache import enable as enable_cache


def build(envs: int, updates: int, training_start: int):
    cfg = load_config(
        [
            "+algorithm=qmix",
            "env.name=smaclite:3m-v0",
            "env.time_limit=60",
            f"algorithm.parallel_envs={envs}",
            "algorithm.batch_size=256",
            f"algorithm.updates_per_collect={updates}",
            "algorithm.buffer_size=65536",
            f"algorithm.training_start={training_start}",
            "algorithm.replay_slot_reuse=clear",
        ]
    )
    env_cfg = cfg.env.to_dict()
    env_cfg.pop("parallel_envs", None)
    env = make_env(env_cfg.pop("name"), **env_cfg)
    _, init_state, train_chunk, _ = build_train_functions(env, env, cfg.algorithm, 60)
    return init_state, train_chunk


def measure(init_state, train_chunk, iters: int, windows: int = 3):
    state = init_state(jax.random.PRNGKey(0))
    chunk, costs, _ = profiling.compile_and_analyze(
        lambda s: train_chunk(s, iters)[0], state
    )
    state = chunk(state)  # warmup
    s_prev = int(jax.device_get(state.env_steps))  # sync (axon: block_until_ready
    # on a never-fetched chunk output can return without waiting; device_get is
    # the reliable sync — BASELINE.md "measurement methodology")
    best, best_steps = float("inf"), 0
    for _ in range(windows):
        t0 = time.time()
        state = chunk(state)
        s_now = int(jax.device_get(state.env_steps))
        dt = time.time() - t0
        if dt < best:
            best, best_steps = dt, s_now - s_prev
        s_prev = s_now
    return best / iters, best_steps / iters, costs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--envs", type=int, default=16384)
    args = ap.parse_args()
    enable_cache()

    # full iteration (8 updates engaged from iteration 1: training_start=0)
    t_full, steps_full, costs_full = measure(*build(args.envs, 8, 0), args.iters)
    # rollout + insert only (training_start huge -> lax.cond skips updates;
    # the branch is still compiled but never runs)
    t_roll, steps_roll, costs_roll = measure(*build(args.envs, 8, 1 << 30), args.iters)

    out = {
        "envs": args.envs,
        "t_full_ms": round(t_full * 1e3, 2),
        "t_rollout_ms": round(t_roll * 1e3, 2),
        "t_update_ms": round((t_full - t_roll) * 1e3, 2),
        "update_share": round((t_full - t_roll) / t_full, 3),
        "steps_per_iter": steps_full,
        "env_steps_per_s_full": round(steps_full / t_full, 1),
        "env_steps_per_s_rollout_only": round(steps_roll / t_roll, 1),
        "flops_full": costs_full.get("flops"),
        "bytes_full": costs_full.get("bytes accessed"),
        "bytes_rollout": costs_roll.get("bytes accessed"),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
