"""DQN-family training driver: python composition layer over the jitted core.

Replaces `marlbase/dqn/train.py:264-345` (`main`). All hot work — rollouts,
replay, updates — happens inside `train_chunk` (see `algos/dqn.py`); this
layer only decides chunk sizes, pulls scalar counters to the host at chunk
boundaries, and handles eval/logging/checkpoint/video.
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np

from codebase_tpu.algos.dqn import build_train_functions
from codebase_tpu.ops.schedules import epsilon_schedule
from codebase_tpu.utils.checkpoint import resolve_resume, save_checkpoint


def _eval_infos(eval_out) -> list:
    """Build per-episode info dicts shaped like the reference's eval infos
    (`RecordEpisodeStatistics` keys, `utils/wrappers.py:36-41`)."""
    returns = np.asarray(eval_out["episode_returns"])  # (E, N)
    lengths = np.asarray(eval_out["episode_lengths"])  # (E,)
    infos = []
    for e in range(returns.shape[0]):
        info = {"episode_returns": returns[e], "episode_length": float(lengths[e])}
        for i in range(returns.shape[1]):
            info[f"agent{i}/episode_returns"] = float(returns[e, i])
        infos.append(info)
    return infos


def main(env, eval_env, logger, time_limit, cfg, mesh=None):
    acfg = cfg.algorithm
    model, init_state, train_chunk, evaluate = build_train_functions(
        env, eval_env, acfg, time_limit, mesh=mesh, debug=bool(cfg.get("debug"))
    )
    logger.watch(model)

    seed = cfg.get("seed")
    key = jax.random.PRNGKey(int(seed) if seed is not None else np.random.randint(2**31 - 1))
    key, k_init = jax.random.split(key)
    state = init_state(k_init)

    run_dir = Path(getattr(logger, "run_dir", "."))
    resume_path = resolve_resume(cfg.get("resume"), run_dir)
    if resume_path:
        # exact resume: params, target, optimizer, replay, rng, counters —
        # the reference cannot do this (weights-only save, SURVEY.md §5)
        from codebase_tpu.utils.checkpoint import load_checkpoint

        state = load_checkpoint(resume_path, template=state)
    # `resume=auto` resolves against the LOCAL filesystem; all processes must
    # have reached the same decision before put_global assembles global state
    from codebase_tpu.parallel.mesh import assert_agreement

    resume_step = int(jax.device_get(state.env_steps)) if resume_path else -1
    assert_agreement(resume_step, "resume checkpoint step")
    if resume_path:
        if mesh is not None:
            from codebase_tpu.parallel.mesh import dqn_state_shardings, put_global

            state = put_global(state, dqn_state_shardings(state, mesh))
        logger.info(f"Resumed from {resume_path} at step {resume_step}")
    elif cfg.get("resume"):
        logger.info("resume=auto: no checkpoint found, starting fresh")

    total_steps = int(acfg.total_steps)
    log_interval = int(acfg.log_interval) if acfg.get("log_interval") else 0
    eval_interval = int(acfg.eval_interval) if acfg.eval_interval else 0
    save_interval = int(acfg.save_interval) if acfg.save_interval else 0
    video_interval = int(acfg.video_interval) if acfg.video_interval else 0
    n_envs = int(acfg.get("parallel_envs", 1))

    # iterations per chunk: aim at the finest logging cadence, assuming full
    # episodes (the reference's `log_interval` is a documented knob that its
    # own loop never reads — only eval_interval gates logging,
    # `dqn/train.py:315` — here it controls the training-metrics cadence)
    cadences = [c for c in (log_interval, eval_interval) if c]
    max_steps_per_iter = n_envs * time_limit
    chunk_iters = max(1, (min(cadences) if cadences else 10_000) // max_steps_per_iter)
    chunk_iters = min(chunk_iters, 256)
    # a cadence finer than one iteration's step budget silently quantises to
    # once-per-iteration; say so up front instead of letting the user discover
    # results.csv rows arriving at a multiple of the configured interval
    for label, interval in (("eval_interval", eval_interval), ("log_interval", log_interval)):
        if interval and interval < max_steps_per_iter:
            logger.warning(
                f"{label}={interval} is below the {max_steps_per_iter} env steps "
                f"one training iteration advances ({n_envs} envs x T={time_limit}); "
                f"effective cadence is ~{max_steps_per_iter} steps"
            )

    eps_sched = epsilon_schedule(
        acfg.eps_decay_style,
        float(acfg.eps_decay_over),
        float(acfg.eps_start),
        float(acfg.eps_end),
        float(acfg.eps_exp_decay_rate),
        total_steps,
    )

    from codebase_tpu.parallel.mesh import fetch_metrics, is_coordinator, sync_flag
    from codebase_tpu.utils.preemption import PreemptionGuard

    coord = is_coordinator()
    step = int(jax.device_get(state.env_steps))
    last_log = last_eval = last_save = last_video = step
    with PreemptionGuard() as guard:
        while step < total_steps + 1:
            state, metrics = train_chunk(state, chunk_iters)
            # ONE device_get for both counters: `int(traced_output)` takes a
            # pathological slow path on tunneled backends (measured ~50s for
            # the first conversion on axon), device_get never does
            step, updates = map(int, jax.device_get((state.env_steps, state.updates)))
            # SIGTERM may land on a subset of hosts; agree before acting so
            # every process takes the save-and-exit path together (a lone
            # exiting process would deadlock the survivors' collectives)
            preempt = sync_flag(guard.triggered)

            # eval rollouts and training metrics have independent cadences but
            # merge into ONE results.csv row when they coincide (the default
            # log_interval == eval_interval reproduces the reference's combined
            # row, `dqn/train.py:315-327`)
            infos = []
            do_eval = eval_interval and (step - last_eval) >= eval_interval
            do_log = log_interval and (step - last_log) >= log_interval
            if do_eval:
                key, k_eval = jax.random.split(key)
                # every process runs the (replicated) eval program and the
                # gather; only the coordinator logs
                infos.extend(_eval_infos(fetch_metrics(evaluate(state.params, k_eval))))
                last_eval = step
            if do_log:
                losses = np.asarray(fetch_metrics(metrics["loss"]))
                if np.any(~np.isnan(losses)):
                    infos.append({"loss": float(np.nanmean(losses))})
                last_log = step
            if infos:
                # every row carries the step/update counters, whichever cadence
                # fired (one dict so squash_info passes them through unprefixed)
                counters = {"updates": updates, "environment_steps": step}
                if do_log:
                    counters["epsilon"] = float(eps_sched(step))
                infos.append(counters)
                if coord:
                    logger.log_metrics(infos)

            if coord and video_interval and (step - last_video) >= video_interval:
                from codebase_tpu.utils.video import record_episodes

                record_episodes(
                    eval_env,
                    model.policy(state.params, float(acfg.eps_evaluation)),
                    int(acfg.video_frames),
                    run_dir / "videos" / f"step-{step}.mp4",
                )
                last_video = step

            do_save = save_interval and (step - last_save) >= save_interval
            if preempt:
                logger.info(f"SIGTERM received: checkpointing at step {step} and exiting")
                do_save = True
            if do_save:
                # multi-host: the replay shards are non-addressable from any
                # one host, so every process joins the gather; one writes
                host_state = fetch_metrics(state)
                if coord:
                    save_checkpoint(run_dir / "checkpoints" / f"model_s{step}.msgpack", host_state)
                last_save = step
            if preempt:
                break

        # final-state checkpoint: the interval arithmetic usually leaves the
        # last save short of total_steps; a checkpointing run should end with
        # its final params on disk
        if save_interval and step > last_save:
            host_state = fetch_metrics(state)
            if coord:
                save_checkpoint(run_dir / "checkpoints" / f"model_s{step}.msgpack", host_state)

    return state
