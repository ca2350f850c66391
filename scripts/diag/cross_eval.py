"""Cross-harness evaluation: score the SAME trained policy under both the
framework's vmapped evaluator and the reference's sequential `_evaluate`
loop (unmodified, imported in place from /root/reference), on the same env
dynamics.

Two directions:
- `--fw-ckpt <msgpack>`: framework-trained params -> torch transplant ->
  reference `_evaluate`; and the framework's own `evaluate`.
- `--ref-ckpt <model_s*.pt>`: reference-trained torch state_dict ->
  framework params transplant -> framework `evaluate`; and the reference's
  own `_evaluate`.

If the two harnesses disagree on the same params, the eval protocols
differ; if they agree, the measured gate delta is a genuine training-side
difference. Round-3 gate diagnosis tooling (see BASELINE.md).

Usage:
  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python scripts/diag/cross_eval.py \
      --fw-ckpt outputs/fw_gate_ckpt/idqn_seed0/checkpoints/model_s*.msgpack \
      --episodes 1000
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

ENV_NAME = "Foraging-8x8-2p-3f-v3"
TIME_LIMIT = 25
N_AGENTS = 2
N_ACTIONS = 6
EPS_EVAL = 0.05


def fw_eval(params_critic, episodes, seed):
    import jax

    from codebase_tpu.algos.dqn import DQNModel
    from codebase_tpu.envs.factory import make_env
    from codebase_tpu.envs.vector import collect_episodes
    from codebase_tpu.models.multi_agent import MultiAgentNetwork

    env = make_env(ENV_NAME, time_limit=TIME_LIMIT)
    critic = MultiAgentNetwork.create(
        input_sizes=env.obs_dims,
        hidden_dims=(128, 128),
        output_sizes=env.action_dims,
        parameter_sharing=False,
    )
    model = DQNModel(
        critic=critic,
        mixer=None,
        mixer_type="none",
        gamma=0.99,
        double_q=True,
        standardise_returns=False,
        use_action_masks=False,
    )
    rollout, _ = collect_episodes(
        env,
        model.policy({"critic": params_critic}, EPS_EVAL),
        None,
        jax.random.PRNGKey(seed),
        episodes,
        TIME_LIMIT,
    )
    returns = np.asarray(rollout.episode_returns).sum(-1)  # (E,)
    return float(returns.mean()), float(returns.std())


def ref_eval(params_critic, episodes, seed):
    import torch
    from omegaconf import DictConfig

    from marlbase.dqn.model import QNetwork
    from marlbase.dqn.train import _evaluate

    sys.path.insert(0, str(REPO / "scripts" / "ref_gate"))
    from run_ref_gate import build_single_env

    torch.set_num_threads(1)
    env = build_single_env(seed + 777)
    cfg = DictConfig(
        dict(
            optimizer="Adam",
            lr=3e-4,
            gamma=0.99,
            grad_clip=1.0,
            target_update_interval_or_tau=200,
            double_q=True,
            standardise_returns=False,
        )
    )
    qnet = QNetwork(
        env.observation_space,
        env.action_space,
        cfg,
        layers=[128, 128],
        parameter_sharing=False,
        use_rnn=False,
        use_orthogonal_init=True,
        device="cpu",
    )
    with torch.no_grad():
        for g in range(N_AGENTS):
            seq = qnet.critic.independent[g].network
            li = [i for i, m in enumerate(seq) if isinstance(m, torch.nn.Linear)]
            for j, idx in enumerate(li):
                seq[idx].weight.copy_(
                    torch.from_numpy(np.asarray(params_critic["layers"][j]["w"][g]).T.copy())
                )
                seq[idx].bias.copy_(
                    torch.from_numpy(np.asarray(params_critic["layers"][j]["b"][g]).copy())
                )
    infos = _evaluate(env, qnet, episodes, EPS_EVAL)
    returns = np.array([np.asarray(i["episode_returns"]).sum() for i in infos])
    return float(returns.mean()), float(returns.std())


def load_fw_params(path):
    from codebase_tpu.utils.checkpoint import load_checkpoint

    state = load_checkpoint(path)
    critic = state["params"]["critic"]
    # nested state dict: {"layers": {"0": {"w":..}, ...}} -> list form
    layers = [critic["layers"][str(i)] for i in range(len(critic["layers"]))]
    return {"layers": [{"w": np.asarray(l["w"]), "b": np.asarray(l["b"])} for l in layers]}


def load_ref_params(path):
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    # critic.independent.{g}.network.{idx}.weight
    layers = {}
    for k, v in sd.items():
        if not k.startswith("critic.independent."):
            continue
        parts = k.split(".")
        g, idx, kind = int(parts[2]), int(parts[4]), parts[5]
        layers.setdefault(idx, {}).setdefault(kind, {})[g] = v.numpy()
    out = []
    for idx in sorted(layers):
        w = np.stack([layers[idx]["weight"][g].T for g in range(N_AGENTS)])
        b = np.stack([layers[idx]["bias"][g] for g in range(N_AGENTS)])
        out.append({"w": w, "b": b})
    return {"layers": out}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fw-ckpt")
    ap.add_argument("--ref-ckpt")
    ap.add_argument("--episodes", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    assert bool(args.fw_ckpt) != bool(args.ref_ckpt), "pass exactly one checkpoint"
    if args.fw_ckpt:
        params = load_fw_params(args.fw_ckpt)
        src = args.fw_ckpt
    else:
        params = load_ref_params(args.ref_ckpt)
        src = args.ref_ckpt

    fm, fs = fw_eval(params, args.episodes, args.seed)
    rm, rs = ref_eval(params, args.episodes, args.seed)
    print(
        json.dumps(
            {
                "params_from": src,
                "episodes": args.episodes,
                "fw_harness": {"mean": round(fm, 4), "std": round(fs, 4)},
                "ref_harness": {"mean": round(rm, 4), "std": round(rs, 4)},
                "delta": round(fm - rm, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
