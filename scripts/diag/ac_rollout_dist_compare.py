"""Frozen-policy rollout distribution equivalence for the AC family
(round 5).

The ippo n=10 gate passes strict but leans one-sided (fw wins 1/10,
sign p~0.01) while the UPDATE chain is bit-faithful in f64
(`ppo_update_parity.py`) and the measurement channel is identical (both
sides log training episodes). The remaining stage is data collection:
sampling-policy rollouts. This diagnostic drives BOTH stacks with the SAME
frozen actor parameters on the same env dynamics and compares what the
learner sees:

  - episode length distribution,
  - per-agent episode return distribution,
  - per-step action marginals (the sampling distribution itself).

Reference side runs `marlbase.ac.model.A2CNetwork.act` byte-for-byte
(imported from /root/reference via the shims) through
`envs/gym_compat.GymnasiumEnv`; torch params copied from the identical
framework init (same conversion as ppo_update_parity.py).

Usage (CPU):
  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python \
      scripts/diag/ac_rollout_dist_compare.py --episodes 2000
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
N_AGENTS = 2
N_ACTIONS = 6


def make_params(train_steps: int = 0):
    """Framework-init actor params; optionally pre-trained a little so the
    policy is not uniform (a trained policy exposes distribution mismatches
    the uniform init would mask)."""
    import jax

    from codebase_tpu.algos.ac import build_train_functions
    from codebase_tpu.config import load_config
    from codebase_tpu.envs.factory import make_env

    cfg = load_config(
        ["+algorithm=ippo", f"env.name={ENV_NAME}", "env.time_limit=25"]
    )
    env = make_env(ENV_NAME, time_limit=T)
    model, init_state, train_chunk, _ = build_train_functions(
        env, env, cfg.algorithm, T
    )
    state = init_state(jax.random.PRNGKey(0))
    if train_steps:
        state, _ = train_chunk(state, train_steps)
    return jax.device_get(state.params), model, env, cfg


def fw_side(params, model, env, n_episodes, seed):
    import jax

    from codebase_tpu.envs.vector import collect_episodes

    E = 100
    lengths, returns, act_counts = [], [], np.zeros(N_ACTIONS)
    key = jax.random.PRNGKey(seed)
    for _ in range(n_episodes // E):
        key, k = jax.random.split(key)
        rollout, _ = collect_episodes(
            env, model.policy(params["actor"]),
            model.actor.init_hiddens(E), k, E, T, False,
        )
        r = jax.device_get(rollout)
        lengths.append(r.episode_lengths)
        returns.append(r.episode_returns)
        acts = np.asarray(r.actions)  # (T, E, N)
        filled = np.asarray(r.filled)  # (T, E)
        for a in range(N_ACTIONS):
            act_counts[a] += ((acts == a) * filled[..., None]).sum()
    return (
        np.concatenate(lengths),
        np.concatenate(returns),
        act_counts / act_counts.sum(),
    )


def ref_side(params, cfg_algo, n_episodes, seed):
    import torch
    from gymnasium import spaces
    from omegaconf import DictConfig

    from marlbase.ac.model import A2CNetwork

    torch.set_num_threads(1)
    torch.manual_seed(seed)

    from codebase_tpu.envs import wrappers as W
    from codebase_tpu.envs.factory import make_base_env
    from codebase_tpu.envs.gym_compat import GymnasiumEnv

    base = W.TimeLimit(make_base_env(ENV_NAME), limit=T)
    env = GymnasiumEnv(base, seed=seed)

    obs_dims = base.obs_dims
    obs_space = spaces.Tuple(
        [spaces.Box(-np.inf, np.inf, (d,)) for d in obs_dims]
    )
    act_space = spaces.Tuple([spaces.Discrete(N_ACTIONS) for _ in range(N_AGENTS)])
    cfg = DictConfig(
        dict(
            optimizer="Adam", lr=3e-4, gamma=0.99, grad_clip=False, n_steps=5,
            entropy_coef=0.001, value_loss_coef=0.5,
            target_update_interval_or_tau=200, standardise_returns=False,
        )
    )
    actor_cfg = DictConfig(dict(
        layers=[128, 128], parameter_sharing=False,
        use_orthogonal_init=True, use_rnn=False,
    ))
    critic_cfg = DictConfig(dict(
        layers=[128, 128], parameter_sharing=False,
        use_orthogonal_init=True, use_rnn=False, centralised=False,
    ))
    net = A2CNetwork(obs_space, act_space, cfg, actor_cfg, critic_cfg, "cpu")
    with torch.no_grad():
        for g in range(N_AGENTS):
            seq = net.actor.independent[g].network
            li = [i for i, m in enumerate(seq) if isinstance(m, torch.nn.Linear)]
            for j, idx in enumerate(li):
                w = np.asarray(params["actor"]["layers"][j]["w"][g]).T
                b = np.asarray(params["actor"]["layers"][j]["b"][g])
                seq[idx].weight.copy_(torch.from_numpy(w.copy()))
                seq[idx].bias.copy_(torch.from_numpy(b.copy()))

    lengths, returns = [], []
    act_counts = np.zeros(N_ACTIONS)
    for ep in range(n_episodes):
        obs, _ = env.reset()
        obs = [torch.tensor(o).unsqueeze(0) for o in obs]
        hiddens = net.init_actor_hiddens(1)
        ret = np.zeros(N_AGENTS)
        t = 0
        done = False
        while not done:
            with torch.no_grad():
                actions, hiddens = net.act(obs, hiddens)
            acts = [int(a.item()) for a in actions]
            for a in acts:
                act_counts[a] += 1
            nobs, rew, term, trunc, _ = env.step(acts)
            ret += np.asarray(rew)
            obs = [torch.tensor(o).unsqueeze(0) for o in nobs]
            t += 1
            done = term or trunc
        lengths.append(t)
        returns.append(ret)
    return np.asarray(lengths), np.asarray(returns), act_counts / act_counts.sum()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, default=2000)
    ap.add_argument(
        "--pretrain-iters", type=int, default=40,
        help="framework train iterations to give the frozen policy structure",
    )
    args = ap.parse_args()

    params, model, env, cfg = make_params(args.pretrain_iters)
    fl, fr, fa = fw_side(params, model, env, args.episodes, seed=1)
    rl, rr, ra = ref_side(params, cfg.algorithm, args.episodes, seed=2)

    def mstd(x):
        return float(np.mean(x)), float(np.std(x) / np.sqrt(len(x)))

    out = {
        "episodes": args.episodes,
        "fw_len": mstd(fl), "ref_len": mstd(rl),
        "fw_ret": mstd(fr.mean(-1)), "ref_ret": mstd(rr.mean(-1)),
        "fw_action_marginals": [round(float(x), 4) for x in fa],
        "ref_action_marginals": [round(float(x), 4) for x in ra],
        "len_delta_in_se": float(
            (np.mean(fl) - np.mean(rl))
            / np.sqrt(np.var(fl) / len(fl) + np.var(rl) / len(rl))
        ),
        "ret_delta_in_se": float(
            (np.mean(fr.mean(-1)) - np.mean(rr.mean(-1)))
            / np.sqrt(
                np.var(fr.mean(-1)) / len(fr) + np.var(rr.mean(-1)) / len(rr)
            )
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
