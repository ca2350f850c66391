"""Frozen-policy rollout + replay distribution equivalence (round 4).

Round 3 proved the UPDATE chain bit-faithful and the EVAL harness
equivalent; the residual one-sided IDQN deficit (CKPT gate 5/5 in the
reference's favor, sign-test p~0.03) therefore implicates the remaining
stage: the data entering the learner — exploration rollouts and replay
storage. This diagnostic drives BOTH stacks with the SAME frozen policy
parameters (no learning) at a fixed epsilon on the same env dynamics and
compares the distributions that matter to the learner:

  - episode length and per-agent return distributions (rollout behavior),
  - sampled-batch statistics after the buffer wraps: mean reward over
    filled steps, filled fraction, stale-tail fraction (slot-reuse quirk),
    mean |obs| (storage dtype effects).

If these match to Monte-Carlo error, rollout + replay are exonerated too,
and the gate residual cannot be a systematic semantic gap in the data
path. Reference side runs `marlbase.dqn` machinery byte-for-byte (imported
from /root/reference via the hydra/omegaconf shims) through
`envs/gym_compat.GymnasiumEnv` with torch params copied from the identical
framework init (same conversion as scripts/diag/update_parity.py).

Usage (CPU):
  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python \
      scripts/diag/rollout_dist_compare.py --episodes 3000 [--epsilon 0.3]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO / "scripts" / "ref_shims"))
sys.path.insert(0, "/root/reference")
sys.path.insert(0, str(REPO))

import numpy as np

ENV_NAME = "lbforaging:Foraging-8x8-2p-3f-v3"
T = 25
BUFFER = 1000  # small so both buffers wrap within --episodes
BATCH = 32


def fw_side(params, n_episodes, epsilon, seed):
    import jax
    import jax.numpy as jnp

    from codebase_tpu.algos.dqn import DQNModel
    from codebase_tpu.envs.factory import make_env
    from codebase_tpu.envs.vector import collect_episodes
    from codebase_tpu.models.multi_agent import MultiAgentNetwork
    from codebase_tpu.ops.replay import replay_add, replay_init, replay_sample

    env = make_env(ENV_NAME, time_limit=T)
    critic = MultiAgentNetwork.create(
        input_sizes=env.obs_dims,
        hidden_dims=(128, 128),
        output_sizes=env.action_dims,
        parameter_sharing=False,
        use_rnn=False,
    )
    model = DQNModel(
        critic=critic, mixer=None, mixer_type="none", gamma=0.99,
        double_q=True, standardise_returns=False, use_action_masks=False,
    )
    buf = replay_init(
        BUFFER, T, env.n_agents, env.obs_dim, env.n_actions,
        with_mask=False, obs_dtype=jnp.bfloat16,
    )
    pol = model.policy(jax.tree.map(jnp.asarray, params), epsilon)

    @jax.jit
    def one(buf, key):
        rollout, _ = collect_episodes(env, pol, None, key, 1, T)
        return replay_add(buf, rollout, "reference"), rollout.episode_lengths[0], jnp.sum(rollout.stat_rewards)

    lengths, returns = [], []
    key = jax.random.PRNGKey(seed)
    for _ in range(n_episodes):
        key, k = jax.random.split(key)
        buf, l, r = one(buf, k)
        lengths.append(float(l))
        returns.append(float(r))

    # sampled-batch statistics (the learner's actual input distribution)
    stats = []
    for i in range(200):
        b = replay_sample(buf, jax.random.PRNGKey(10_000 + i), BATCH)
        filled = np.asarray(b["filled"])  # (T, B)
        rew = np.asarray(b["rewards"])  # (N, T, B)
        obs = np.asarray(b["obss"], np.float32)
        stats.append(
            (
                float((rew.sum(0) * filled).sum() / max(filled.sum(), 1)),
                float(filled.mean()),
                float(np.abs(obs).mean()),
            )
        )
    return np.array(lengths), np.array(returns), np.array(stats)


def ref_side(params, n_episodes, epsilon, seed):
    import random

    import torch

    from marlbase.dqn import train as ref_train
    from marlbase.dqn.model import QNetwork
    from omegaconf import DictConfig

    sys.path.insert(0, str(REPO / "scripts" / "ref_gate"))
    from run_ref_gate import build_single_env

    torch.set_num_threads(1)
    torch.manual_seed(seed)
    np.random.seed(seed)
    random.seed(seed)

    env = build_single_env(seed)
    cfg = DictConfig(
        dict(
            optimizer="Adam", lr=3e-4, gamma=0.99, grad_clip=1.0,
            target_update_interval_or_tau=200, double_q=True,
            standardise_returns=False,
        )
    )
    model = QNetwork(
        env.observation_space, env.action_space, cfg,
        layers=[128, 128], parameter_sharing=False, use_rnn=False,
        use_orthogonal_init=True, device="cpu",
    )
    # copy the identical framework init into the torch nets (exact same
    # conversion as scripts/diag/update_parity.py:run_reference)
    with torch.no_grad():
        for g in range(env.unwrapped.n_agents):
            seq = model.critic.independent[g].network
            linear_idx = [i for i, m in enumerate(seq) if isinstance(m, torch.nn.Linear)]
            for j, li in enumerate(linear_idx):
                w = np.asarray(params["critic"]["layers"][j]["w"][g]).T
                b = np.asarray(params["critic"]["layers"][j]["b"][g])
                seq[li].weight.copy_(torch.from_numpy(w.copy()))
                seq[li].bias.copy_(torch.from_numpy(b.copy()))
    rb = ref_train.ReplayBuffer(
        BUFFER, env.unwrapped.n_agents, env.observation_space, env.action_space,
        T, "cpu", store_action_masks=False,
    )
    lengths, returns = [], []
    for _ in range(n_episodes):
        t, info = ref_train._collect_trajectory(env, model, rb, epsilon, False)
        lengths.append(t)
        returns.append(
            float(np.sum(info["episode_returns"]))
            if "episode_returns" in info
            else np.nan
        )

    stats = []
    for i in range(200):
        b = rb.sample(BATCH)
        filled = b.filled.numpy()  # (T, B)
        rew = b.rewards.numpy()  # (N, T, B)
        obs = b.obss.numpy()
        stats.append(
            (
                float((rew.sum(0) * filled).sum() / max(filled.sum(), 1)),
                float(filled.mean()),
                float(np.abs(obs).mean()),
            )
        )
    return np.array(lengths), np.array(returns), np.array(stats)


def summarize(name, lengths, returns, stats):
    out = {
        "side": name,
        "episodes": len(lengths),
        "len_mean": round(float(lengths.mean()), 4),
        "len_std": round(float(lengths.std()), 4),
        "batch_reward_mean": round(float(stats[:, 0].mean()), 6),
        "batch_filled_frac": round(float(stats[:, 1].mean()), 5),
        "batch_abs_obs_mean": round(float(stats[:, 2].mean()), 5),
    }
    if not np.isnan(returns).all():
        out["return_mean"] = round(float(np.nanmean(returns)), 4)
    print(json.dumps(out), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, default=3000)
    ap.add_argument("--epsilon", type=float, default=0.3)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    from codebase_tpu.envs.factory import make_env
    from codebase_tpu.models.multi_agent import MultiAgentNetwork

    env = make_env(ENV_NAME, time_limit=T)
    critic = MultiAgentNetwork.create(
        input_sizes=env.obs_dims,
        hidden_dims=(128, 128),
        output_sizes=env.action_dims,
        parameter_sharing=False,
        use_rnn=False,
    )
    params = jax.device_get({"critic": critic.init(jax.random.PRNGKey(0))})

    fw = summarize("framework", *fw_side(params, args.episodes, args.epsilon, args.seed))
    ref = summarize("reference", *ref_side(params, args.episodes, args.epsilon, args.seed))

    n = args.episodes
    len_se = (fw["len_std"] ** 2 / n + fw["len_std"] ** 2 / n) ** 0.5
    verdict = {
        "len_mean_delta": round(fw["len_mean"] - ref["len_mean"], 4),
        "len_mean_se": round(len_se, 4),
        "len_within_3se": abs(fw["len_mean"] - ref["len_mean"]) <= 3 * len_se,
        "batch_reward_delta": round(
            fw["batch_reward_mean"] - ref["batch_reward_mean"], 6
        ),
        "filled_frac_delta": round(
            fw["batch_filled_frac"] - ref["batch_filled_frac"], 5
        ),
        "abs_obs_delta": round(
            fw["batch_abs_obs_mean"] - ref["batch_abs_obs_mean"], 5
        ),
    }
    print(json.dumps(verdict), flush=True)


if __name__ == "__main__":
    main()
