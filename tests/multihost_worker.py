"""One worker process of the 2-process multi-host test (`test_multihost.py`).

Each worker fakes 4 CPU devices; together they form one 8-device global mesh
spanning 2 OS processes — the standard JAX way to exercise the multi-host
path (jax.distributed.initialize + GSPMD collectives over the coordination
service) without a TPU pod. SURVEY.md §2 distributed row; `parallel/mesh.py`.

Invoked as:
    python tests/multihost_worker.py <process_id> <num_processes> <port> <run_dir>
Environment must carry JAX_PLATFORMS=cpu (the launcher sets everything else).
"""

import os
import sys


def main():
    proc_id, nproc, port, run_dir = sys.argv[1:5]
    os.environ["JAX_PLATFORMS"] = "cpu"
    # exactly 4 local devices, dropping any inherited device-count flag
    inherited = [
        f
        for f in os.environ.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    os.environ["XLA_FLAGS"] = " ".join(
        ["--xla_force_host_platform_device_count=4"] + inherited
    )
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
    os.environ["JAX_NUM_PROCESSES"] = nproc
    os.environ["JAX_PROCESS_ID"] = proc_id

    import jax

    from codebase_tpu.parallel.mesh import is_coordinator, maybe_initialize_distributed

    # the explicit-coordinator "always" path (zero coverage before round 3)
    assert maybe_initialize_distributed("always") is True
    assert jax.process_count() == int(nproc), jax.process_count()
    assert len(jax.devices()) == 4 * int(nproc), len(jax.devices())
    assert is_coordinator() == (int(proc_id) == 0)

    # run the REAL train CLI end-to-end over the global mesh: builds the
    # 8-device mesh from config, shards envs+replay, trains, logs, saves
    from codebase_tpu.run import main as run_main

    run_main(
        [
            "+algorithm=idqn",
            "env.name=Foraging-8x8-2p-3f-v3",
            "env.time_limit=25",
            "env.parallel_envs=8",
            "seed=0",
            "algorithm.total_steps=2000",
            "algorithm.training_start=100",
            "algorithm.buffer_size=64",
            "algorithm.batch_size=8",
            "algorithm.eval_interval=1000",
            "algorithm.eval_episodes=8",
            "algorithm.log_interval=1000",
            "algorithm.save_interval=1000",
            "distributed.devices=all",
            "distributed.initialize=always",
            f"run_dir={run_dir}",
        ]
    )

    # every process reports its view; the pytest asserts on these lines
    print(
        f"WORKER_OK process={jax.process_index()}/{jax.process_count()} "
        f"devices={len(jax.devices())}",
        flush=True,
    )


if __name__ == "__main__":
    main()
