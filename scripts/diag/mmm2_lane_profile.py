"""Round-5 MMM2 compute-dominant lane profile (VERDICT r4 weak #3 / item 4):
split the qmix_smaclite_mmm2_big iteration into rollout vs update and charge
each phase its ANALYTIC matmul flops, so the "remaining 47%" of MFU is
attributed by measurement — rollout serialisation (the T=120 sequential GRU
carry chain over E*N agent rows per step) vs update-path gaps (B episodes x
T+1 rows of BPTT + mixer).

Usage:
    python scripts/diag/mmm2_lane_profile.py [--envs 2048] [--batch 128]
        [--updates 8] [--iters 4]
Prints one JSON line with the split, per-phase analytic MFU, and the
whole-iteration MFU; run a small (--envs, --batch) grid to see whether any
shape moves the ceiling.
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
from codebase_tpu.bench_suite import PEAK_FLOPS, analytic_flops
from codebase_tpu.config import load_config
from codebase_tpu.envs.factory import make_env
from codebase_tpu.utils import profiling
from codebase_tpu.utils.compilation_cache import enable as enable_cache

TL = 120


def build(envs: int, batch: int, updates: int, training_start: int):
    cfg = load_config(
        [
            "+algorithm=qmix",
            "env.name=smaclite:MMM2-v0",
            f"env.time_limit={TL}",
            "algorithm.model.use_rnn=true",
            "algorithm.model.layers=[512,512]",
            "algorithm.model.parameter_sharing=true",
            "algorithm.model.dtype=bfloat16",
            f"algorithm.parallel_envs={envs}",
            f"algorithm.batch_size={batch}",
            f"algorithm.updates_per_collect={updates}",
            f"algorithm.buffer_size={envs}",
            f"algorithm.training_start={training_start}",
            "algorithm.replay_slot_reuse=clear",
        ]
    )
    env_cfg = cfg.env.to_dict()
    env_cfg.pop("parallel_envs", None)
    env = make_env(env_cfg.pop("name"), **env_cfg)
    _, init_state, train_chunk, _ = build_train_functions(env, env, cfg.algorithm, TL)
    return env, cfg, init_state, train_chunk


def measure(init_state, train_chunk, iters: int, windows: int = 3):
    state = init_state(jax.random.PRNGKey(0))
    chunk, costs, _ = profiling.compile_and_analyze(
        lambda s: train_chunk(s, iters)[0], state
    )
    state = chunk(state)  # warmup
    s_prev = int(jax.device_get(state.env_steps))  # reliable axon sync
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
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--envs", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--updates", type=int, default=8)
    args = ap.parse_args()
    enable_cache()

    env, cfg, init_state, train_chunk = build(args.envs, args.batch, args.updates, 0)
    t_full, steps_full, _ = measure(init_state, train_chunk, args.iters)
    _, _, init_ro, chunk_ro = build(args.envs, args.batch, args.updates, 1 << 30)
    t_roll, steps_roll, _ = measure(init_ro, chunk_ro, args.iters)

    roll_per_step, upd_per_iter = analytic_flops(
        env, cfg.algorithm, TL, args.updates
    )
    dev = jax.devices()[0].device_kind
    peak = PEAK_FLOPS.get(dev)
    t_upd = max(t_full - t_roll, 1e-9)
    roll_flops = roll_per_step * steps_full
    out = {
        "envs": args.envs,
        "batch": args.batch,
        "updates": args.updates,
        "t_full_ms": round(t_full * 1e3, 2),
        "t_rollout_ms": round(t_roll * 1e3, 2),
        "t_update_ms": round(t_upd * 1e3, 2),
        "update_share": round(t_upd / t_full, 3),
        "steps_per_iter": steps_full,
        "env_steps_per_s": round(steps_full / t_full, 1),
        "analytic_rollout_flops_per_iter": round(roll_flops, 1),
        "analytic_update_flops_per_iter": round(upd_per_iter, 1),
        "device": dev,
    }
    if peak:
        out["mfu_rollout_phase"] = round(roll_flops / t_roll / peak, 4)
        out["mfu_update_phase"] = round(upd_per_iter / t_upd / peak, 4)
        out["mfu_overall"] = round((roll_flops + upd_per_iter) / t_full / peak, 4)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
