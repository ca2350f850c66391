"""AC-family training driver: python composition layer over the jitted core.

Replaces `marlbase/ac/train.py:155-206` (`main`). Logged episode statistics
come from the training rollouts themselves, exactly like the reference
(which harvests `final_info` from its collection loop rather than running a
separate eval, `ac/train.py:101-110,184-185`).
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np

from codebase_tpu.algos.ac import build_train_functions
from codebase_tpu.utils.checkpoint import resolve_resume, save_checkpoint


def _episode_infos(returns: np.ndarray, lengths: np.ndarray) -> list:
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
        from codebase_tpu.utils.checkpoint import load_checkpoint

        state = load_checkpoint(resume_path, template=state)
    # see dqn_train.py: local-filesystem resume decisions must agree globally
    from codebase_tpu.parallel.mesh import assert_agreement

    resume_step = int(jax.device_get(state.env_steps)) if resume_path else -1
    assert_agreement(resume_step, "resume checkpoint step")
    if resume_path:
        if mesh is not None:
            from codebase_tpu.parallel.mesh import ac_state_shardings, put_global

            state = put_global(state, ac_state_shardings(state, mesh))
        logger.info(f"Resumed from {resume_path} at step {resume_step}")
    elif cfg.get("resume"):
        logger.info("resume=auto: no checkpoint found, starting fresh")

    total_steps = int(acfg.total_steps)
    # the reference's AC loop logs training-collected stats at eval_interval
    # (`ac/train.py:184`; its log_interval knob is never read). Here the
    # training-stats cadence honors log_interval, falling back to
    # eval_interval — identical rows at the default 10k == 10k.
    log_interval = int(acfg.log_interval) if acfg.get("log_interval") else 0
    eval_interval = int(acfg.eval_interval) if acfg.eval_interval else 0
    log_interval = log_interval or eval_interval
    save_interval = int(acfg.save_interval) if acfg.save_interval else 0
    video_interval = int(acfg.video_interval) if acfg.video_interval else 0
    n_envs = int(acfg.get("parallel_envs", 1))

    max_steps_per_iter = n_envs * time_limit
    chunk_iters = max(1, (log_interval or 10_000) // max_steps_per_iter)
    chunk_iters = min(chunk_iters, 256)
    # surface cadence quantisation (see the matching warning in dqn_train.py)
    if log_interval and log_interval < max_steps_per_iter:
        logger.warning(
            f"log_interval={log_interval} is below the {max_steps_per_iter} env steps "
            f"one training iteration advances ({n_envs} envs x T={time_limit}); "
            f"effective cadence is ~{max_steps_per_iter} steps"
        )

    from codebase_tpu.parallel.mesh import fetch_metrics, is_coordinator, sync_flag
    from codebase_tpu.utils.preemption import PreemptionGuard

    coord = is_coordinator()
    step = int(jax.device_get(state.env_steps))
    last_log = last_save = last_video = step
    with PreemptionGuard() as guard:
        while step < total_steps + 1:
            state, metrics = train_chunk(state, chunk_iters)
            # one device_get for both counters (see the note in dqn_train.py)
            step, updates = map(int, jax.device_get((state.env_steps, state.updates)))
            # agree on the preemption flag across hosts (see dqn_train.py)
            preempt = sync_flag(guard.triggered)

            if log_interval and (step - last_log) >= log_interval:
                # log the final iteration's episode batch, mirroring the
                # reference's per-collection infos (`ac/train.py:171-185`)
                metrics = fetch_metrics(metrics)
                returns = np.asarray(metrics["episode_returns"])[-1]  # (E, N)
                lengths = np.asarray(metrics["episode_lengths"])[-1]  # (E,)
                infos = _episode_infos(returns, lengths)
                infos.append(
                    {k: float(np.asarray(metrics[k])[-1]) for k in ("loss", "actor_loss", "value_loss", "entropy")}
                )
                infos.append({"updates": updates, "environment_steps": step})
                if coord:
                    logger.log_metrics(infos)
                last_log = step

            if coord and video_interval and (step - last_video) >= video_interval:
                from codebase_tpu.utils.video import record_episodes

                record_episodes(
                    eval_env,
                    model.policy(state.params["actor"]),
                    int(acfg.video_frames),
                    run_dir / "videos" / f"step-{step}.mp4",
                )
                last_video = step

            do_save = save_interval and (step - last_save) >= save_interval
            if preempt:
                logger.info(f"SIGTERM received: checkpointing at step {step} and exiting")
                do_save = True
            if do_save:
                host_state = fetch_metrics(state)
                if coord:
                    save_checkpoint(run_dir / "checkpoints" / f"model_s{step}.msgpack", host_state)
                last_save = step
            if preempt:
                break

        # final-state checkpoint (see the matching note in dqn_train.py)
        if save_interval and step > last_save:
            host_state = fetch_metrics(state)
            if coord:
                save_checkpoint(run_dir / "checkpoints" / f"model_s{step}.msgpack", host_state)

    return state
