"""Profiling/observability subsystem (SURVEY.md §5 'new framework' items)."""

import jax
import jax.numpy as jnp
import numpy as np

from codebase_tpu.utils import profiling


def test_cost_analysis_reports_flops_for_matmul():
    a = jnp.ones((64, 64), jnp.float32)
    costs = profiling.cost_analysis(lambda x: x @ x, a)
    # CPU backend reports flops for dot; 2*64^3 = 524288 multiply-adds
    if costs:  # some backends report nothing — tool must degrade gracefully
        assert costs.get("flops", 0) >= 2 * 64**3 * 0.5


def test_compiled_memory_analysis_keys():
    a = jnp.ones((128, 128), jnp.float32)
    mem = profiling.compiled_memory_analysis(lambda x: x @ x + 1.0, a)
    if mem:
        assert all(isinstance(v, int) for v in mem.values())
        assert mem.get("output_size_in_bytes", 128 * 128 * 4) == 128 * 128 * 4


def test_device_memory_stats_shape():
    stats = profiling.device_memory_stats()
    assert len(stats) == len(jax.devices())
    assert all(isinstance(v, dict) for v in stats.values())


def test_step_timer_rate():
    t = profiling.StepTimer()
    assert t.mark(0) is None
    import time

    time.sleep(0.01)
    rate = t.mark(1000)
    assert rate is not None and rate > 0
    assert t.rate() == rate


def test_trace_and_annotate_smoke(tmp_path):
    with profiling.trace(tmp_path / "tr"):
        with profiling.annotate("span"):
            jnp.ones(8).block_until_ready()
    assert any((tmp_path / "tr").rglob("*"))


def test_profile_cli_end_to_end(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from codebase_tpu.profile import main

    report = main(
        [
            "+algorithm=idqn",
            "env.name=lbforaging:Foraging-5x5-2p-1f-v3",
            "env.time_limit=5",
            "env.parallel_envs=4",
            "algorithm.training_start=0",
            "algorithm.batch_size=2",
            "algorithm.buffer_size=16",
            "profile.chunks=2",
            "profile.chunk_iters=2",
        ]
    )
    assert report["env_steps_per_s"] > 0
    assert report["updates_per_s"] > 0
    assert np.isfinite(report["env_steps_per_s"])
