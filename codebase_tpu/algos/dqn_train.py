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
from codebase_tpu.utils.checkpoint import save_checkpoint


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


def main(env, eval_env, logger, time_limit, cfg):
    acfg = cfg.algorithm
    model, init_state, train_chunk, evaluate = build_train_functions(
        env, eval_env, acfg, time_limit
    )
    logger.watch(model)

    seed = cfg.get("seed")
    key = jax.random.PRNGKey(int(seed) if seed is not None else np.random.randint(2**31 - 1))
    key, k_init = jax.random.split(key)
    state = init_state(k_init)

    if cfg.get("resume"):
        # exact resume: params, target, optimizer, replay, rng, counters —
        # the reference cannot do this (weights-only save, SURVEY.md §5)
        from codebase_tpu.utils.checkpoint import load_checkpoint

        state = load_checkpoint(cfg.resume, template=state)
        logger.info(f"Resumed from {cfg.resume} at step {int(state.env_steps)}")

    total_steps = int(acfg.total_steps)
    eval_interval = int(acfg.eval_interval) if acfg.eval_interval else 0
    save_interval = int(acfg.save_interval) if acfg.save_interval else 0
    video_interval = int(acfg.video_interval) if acfg.video_interval else 0
    n_envs = int(acfg.get("parallel_envs", 1))

    # iterations per chunk: aim at the eval cadence, assuming full episodes
    max_steps_per_iter = n_envs * time_limit
    chunk_iters = max(1, (eval_interval or 10_000) // max_steps_per_iter)
    chunk_iters = min(chunk_iters, 256)

    eps_sched = epsilon_schedule(
        acfg.eps_decay_style,
        float(acfg.eps_decay_over),
        float(acfg.eps_start),
        float(acfg.eps_end),
        float(acfg.eps_exp_decay_rate),
        total_steps,
    )

    run_dir = Path(getattr(logger, "run_dir", "."))
    step = int(state.env_steps)
    last_eval = last_save = last_video = step
    while step < total_steps + 1:
        state, metrics = train_chunk(state, chunk_iters)
        step = int(state.env_steps)
        updates = int(state.updates)

        if eval_interval and (step - last_eval) >= eval_interval:
            key, k_eval = jax.random.split(key)
            infos = _eval_infos(evaluate(state.params, k_eval))
            losses = np.asarray(metrics["loss"])
            train_metrics = {}
            if np.any(~np.isnan(losses)):
                train_metrics["loss"] = float(np.nanmean(losses))
            if train_metrics:
                infos.append(train_metrics)
            infos.append(
                {
                    "updates": updates,
                    "environment_steps": step,
                    "epsilon": float(eps_sched(step)),
                }
            )
            logger.log_metrics(infos)
            last_eval = step

        if video_interval and (step - last_video) >= video_interval:
            from codebase_tpu.utils.video import record_episodes

            record_episodes(
                eval_env,
                model.policy(state.params, float(acfg.eps_evaluation)),
                int(acfg.video_frames),
                run_dir / "videos" / f"step-{step}.mp4",
            )
            last_video = step

        if save_interval and (step - last_save) >= save_interval:
            save_checkpoint(run_dir / "checkpoints" / f"model_s{step}.pkl", state)
            last_save = step

    return state
