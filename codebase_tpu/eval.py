"""Checkpoint evaluation CLI — `python -m codebase_tpu.eval path=<run_dir>`.

Replaces `marlbase/eval.py`: loads a finished run's `config.yaml`, finds the
latest checkpoint (or `load_step=N`, `eval.py:42-53`), rebuilds the model,
runs evaluation rollouts and (optionally) records a video.
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import yaml

from codebase_tpu.config import Config
from codebase_tpu.envs.factory import make_env
from codebase_tpu.utils.checkpoint import latest_checkpoint, load_checkpoint

log = logging.getLogger("codebase_tpu")

DQN_FAMILY = ("idqn", "vdn", "qmix")


def build_policy(env, cfg, ckpt_state):
    """Rebuild the greedy/sampling policy for a checkpointed run.

    `ckpt_state` is the raw nested state dict from `load_checkpoint`
    (template-free load); the policies only need its `params` subtree,
    restored against a freshly-initialised template so list-shaped layers
    regain their pytree structure."""
    from flax import serialization

    name = cfg.algorithm.name
    if name in DQN_FAMILY:
        from codebase_tpu.algos.dqn import DQNModel

        model = DQNModel.create(env, cfg.algorithm.model, cfg.algorithm)
    else:
        from codebase_tpu.algos.ac import ACModel

        model = ACModel.create(env, cfg.algorithm.model, cfg.algorithm)
    template = model.init_params(jax.random.PRNGKey(0))
    params = serialization.from_state_dict(template, ckpt_state["params"])
    params = jax.tree.map(jnp.asarray, params)
    if name in DQN_FAMILY:
        return model, model.policy(params, float(cfg.algorithm.eps_evaluation))
    return model, model.policy(params["actor"])


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
    overrides = dict(tok.split("=", 1) for tok in (argv if argv is not None else sys.argv[1:]))
    path = Path(overrides["path"])
    assert path.is_dir(), f"Path {path} does not exist or is not a directory."

    cfg = Config(yaml.safe_load((path / "config.yaml").read_text()))
    env_cfg = cfg.env.to_dict()
    env_cfg.pop("parallel_envs", None)
    env = make_env(env_cfg.pop("name"), **env_cfg)

    if overrides.get("load_step"):
        ckpt_path = path / "checkpoints" / f"model_s{overrides['load_step']}.msgpack"
    else:
        ckpt_path = latest_checkpoint(path / "checkpoints")
    log.info("Loading checkpoint %s", ckpt_path)
    state = load_checkpoint(ckpt_path)

    model, policy = build_policy(env, cfg, state)

    from codebase_tpu.envs.vector import collect_episodes

    episodes = int(overrides.get("eval_episodes", cfg.algorithm.get("eval_episodes", 100)))
    rollout, _ = collect_episodes(
        env, policy, None, jax.random.PRNGKey(int(overrides.get("seed", 0))),
        episodes, int(cfg.env.time_limit),
    )
    returns = np.asarray(rollout.episode_returns)
    log.info(
        "Evaluated %d episodes: mean return %.4f (std %.4f), mean length %.1f",
        episodes,
        returns.sum(-1).mean(),
        returns.sum(-1).std(),
        float(np.asarray(rollout.episode_lengths).mean()),
    )

    video_frames = int(overrides.get("video_frames", 0))
    if video_frames:
        from codebase_tpu.utils.video import record_episodes

        out = Path(overrides.get("video_path", "eval.mp4"))
        record_episodes(env, policy, video_frames, out)
        log.info("Saved video to %s", out)
    return returns


if __name__ == "__main__":
    main()
