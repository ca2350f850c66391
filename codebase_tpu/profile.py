"""Profiling CLI — one-shot performance report for a training configuration.

    python -m codebase_tpu.profile +algorithm=idqn env.name=... env.time_limit=25 \
        [profile.chunks=4] [profile.chunk_iters=8] [profile.trace_dir=/tmp/trace]

Compiles the algorithm's fused train chunk for the given config, then prints:
compiled FLOPs/bytes per chunk (XLA cost analysis), static executable memory,
live device memory, and measured env-steps/s and updates/s over timed chunks.
Optionally captures a TensorBoard/Perfetto trace of the timed region.

The reference has no equivalent (SURVEY.md §5: wall-clock UPS/FPS only,
`marlbase/utils/loggers.py:55-88`).
"""

from __future__ import annotations

import json
import logging
import sys
import time

import jax

from codebase_tpu.config import load_config
from codebase_tpu.envs.factory import make_env
from codebase_tpu.utils import profiling

log = logging.getLogger("codebase_tpu")

DQN_FAMILY = ("idqn", "vdn", "qmix")


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
    from codebase_tpu.utils.compilation_cache import enable as enable_cache

    enable_cache()
    cfg = load_config(argv if argv is not None else sys.argv[1:])
    assert cfg.env.get("name"), "env.name must be set"
    assert cfg.env.get("time_limit"), "env.time_limit must be set"
    assert "name" in cfg.algorithm, "select an algorithm with +algorithm=<name>"

    pcfg = cfg.get("profile")
    chunks = int(pcfg.get("chunks", 4)) if pcfg else 4
    chunk_iters = int(pcfg.get("chunk_iters", 8)) if pcfg else 8
    trace_dir = pcfg.get("trace_dir") if pcfg else None

    env_cfg = cfg.env.to_dict()
    env_cfg.pop("parallel_envs", None)
    env = make_env(env_cfg.pop("name"), **env_cfg)
    if "parallel_envs" in cfg.env:
        cfg.algorithm.parallel_envs = int(cfg.env.parallel_envs)

    from codebase_tpu.parallel.mesh import mesh_from_config

    mesh = mesh_from_config(cfg.get("distributed"))

    if cfg.algorithm.name in DQN_FAMILY:
        from codebase_tpu.algos.dqn import build_train_functions
    else:
        from codebase_tpu.algos.ac import build_train_functions
    _, init_state, train_chunk, _ = build_train_functions(
        env, env, cfg.algorithm, int(cfg.env.time_limit), mesh=mesh
    )

    state = init_state(jax.random.PRNGKey(int(cfg.get("seed") or 0)))

    report = {"algorithm": cfg.algorithm.name, "env": str(cfg.env.name)}

    log.info("Compiling + analyzing train chunk (%d iters/chunk)...", chunk_iters)
    # ONE compile serves the analysis AND the timed runs (large fused train
    # chunks can take minutes per compile)
    chunk, costs, mem = profiling.compile_and_analyze(
        lambda s: train_chunk(s, chunk_iters)[0], state
    )
    if costs:
        flops = costs.get("flops")
        if flops:
            report["chunk_flops"] = float(flops)
        ba = costs.get("bytes accessed")
        if ba:
            report["chunk_bytes_accessed"] = float(ba)
    report.update({f"static_{k}": v for k, v in mem.items()})

    # warm up outside the timed region
    state = chunk(state)
    s0, u0 = map(int, jax.device_get((state.env_steps, state.updates)))

    timer = profiling.StepTimer()
    timer.mark(s0)
    ctx = profiling.trace(trace_dir) if trace_dir else _null()
    t0 = time.time()
    with ctx:
        for _ in range(chunks):
            with profiling.annotate("train_chunk"):
                state = chunk(state)
        steps = int(jax.device_get(state.env_steps))  # device sync (stops the timer)
    dt = time.time() - t0
    timer.mark(steps)

    report["env_steps_per_s"] = round(timer.rate(), 1)
    report["updates_per_s"] = round((int(jax.device_get(state.updates)) - u0) / dt, 2)
    if "chunk_flops" in report:
        report["tflops_per_s"] = round(report["chunk_flops"] * chunks / dt / 1e12, 4)
    dev_mem = profiling.device_memory_stats()
    for dname, s in dev_mem.items():
        if s.get("bytes_in_use") is not None:
            report["hbm_bytes_in_use"] = int(s["bytes_in_use"])
            report["device"] = dname
            break
    if trace_dir:
        report["trace_dir"] = str(trace_dir)

    print(json.dumps(report))
    return report


class _null:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


if __name__ == "__main__":
    main()
