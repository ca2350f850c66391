"""Learning-curve acceptance gate: run the REFERENCE's unmodified torch
algorithms on this framework's JAX environments.

The reference's original env packages (lbforaging/rware/smaclite) are not
installable in this sandbox (zero egress; BASELINE.md documents this), so
the gate instead holds the *environment* fixed and compares the two
*algorithm stacks* on identical dynamics:

- reference side: `marlbase.dqn.train.main` / `marlbase.ac.train.main`
  imported in place from /root/reference (NOT copied), driven through
  `codebase_tpu.envs.gym_compat.GymnasiumEnv` — the reference code runs
  byte-for-byte as shipped, including its ReplayBuffer, models, epsilon
  schedule and update rules, on torch CPU.
- framework side: `python -m codebase_tpu.run` at the same hyperparameters
  on the same JAX env (see BASELINE.md "learning gate").

Missing reference deps `hydra`/`omegaconf` are satisfied by the minimal
shims in scripts/ref_shims (the reference only touches DictConfig attr
access and `hydra.utils.instantiate`).

Hyperparameters are the reference defaults
(`/root/reference/marlbase/configs/{default.yaml,algorithm/idqn.yaml,
algorithm/ia2c.yaml}`).

Usage (CPU JAX; keep PYTHONPATH=/root/repo so the axon TPU sitecustomize is
not loaded — see scripts/test.sh):

    PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
      python scripts/ref_gate/run_ref_gate.py --algo idqn --seed 0 \
        --total-steps 2000000 --out outputs/ref_gate

Writes <out>/<algo>_seed<seed>.csv (one row per eval interval) and prints a
final JSON summary line.
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO / "scripts" / "ref_shims"))
sys.path.insert(0, "/root/reference")
sys.path.insert(0, str(REPO))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

ENV_NAME = "lbforaging:Foraging-8x8-2p-3f-v3"
TIME_LIMIT = 25  # default; override with --env / --time-limit (round 5
# extends the gate beyond LBF: SMAClite exercises the action-mask training
# path end-to-end — reference masks flow through info["action_mask"] into
# the ReplayBuffer and the -1e8 masking in dqn/model.py:100-113 — and RWARE
# cross-checks the second env family, /root/reference/README.md:71-74)

# Reference-default hyperparameters, transcribed from
# /root/reference/marlbase/configs/ (default.yaml + algorithm/{idqn,ia2c}.yaml).
IDQN_CFG = dict(
    name="idqn",
    model=dict(
        _target_="dqn.model.QNetwork",
        layers=[128, 128],
        parameter_sharing=False,
        use_orthogonal_init=True,
        use_rnn=False,
        device="cpu",
    ),
    training_start=2000,
    buffer_size=10000,
    optimizer="Adam",
    lr=3e-4,
    gamma=0.99,
    batch_size=32,
    double_q=True,
    grad_clip=1.0,
    use_proper_termination=False,
    standardise_returns=False,
    eps_decay_style="linear",
    eps_decay_over=0.5,
    eps_start=1.0,
    eps_end=0.05,
    eps_exp_decay_rate=6.5,
    eps_evaluation=0.05,
    target_update_interval_or_tau=200,
    save_interval=False,
    video_interval=False,
    video_frames=500,
)

IA2C_CFG = dict(
    name="ia2c",
    model=dict(
        _target_="ac.model.A2CNetwork",
        actor=dict(
            layers=[128, 128],
            parameter_sharing=False,
            use_orthogonal_init=True,
            use_rnn=False,
        ),
        critic=dict(
            centralised=False,
            layers=[128, 128],
            parameter_sharing=False,
            use_orthogonal_init=True,
            use_rnn=False,
        ),
        device="cpu",
    ),
    optimizer="Adam",
    lr=3e-4,
    grad_clip=False,
    n_steps=5,
    gamma=0.99,
    entropy_coef=0.001,
    value_loss_coef=0.5,
    use_proper_termination=False,
    standardise_returns=False,
    target_update_interval_or_tau=200,
    save_interval=False,
    video_interval=False,
    video_frames=500,
)

# Value-decomposition variants (marlbase/configs/algorithm/{vdn,qmix}.yaml):
# same hyperparameters as idqn, different model _target_, plus the
# CooperativeReward env wrapper (vdn.yaml:6-8).
VDN_CFG = dict(IDQN_CFG, name="vdn", model=dict(IDQN_CFG["model"], _target_="dqn.model.VDNetwork"))
QMIX_CFG = dict(
    IDQN_CFG,
    name="qmix",
    model=dict(
        IDQN_CFG["model"],
        _target_="dqn.model.QMixNetwork",
        mixing=dict(embed_dim=64, hypernet_layers=2, hypernet_embed=32),
    ),
)

# AC variants (marlbase/configs/algorithm/{maa2c,ippo,mappo}.yaml): maa2c =
# ia2c + centralised critic; ippo = ia2c + PPONetwork(num_epochs=4, clip=.2);
# mappo = ippo + centralised critic.
def _ac_variant(name, *, centralised, ppo):
    cfg = dict(IA2C_CFG, name=name)
    cfg["model"] = dict(
        IA2C_CFG["model"],
        critic=dict(IA2C_CFG["model"]["critic"], centralised=centralised),
    )
    if ppo:
        cfg["model"]["_target_"] = "ac.model.PPONetwork"
        cfg["num_epochs"] = 4
        cfg["ppo_clip"] = 0.2
    return cfg


ALGO_CFGS = {
    "idqn": IDQN_CFG,
    "vdn": VDN_CFG,
    "qmix": QMIX_CFG,
    "ia2c": IA2C_CFG,
    "maa2c": _ac_variant("maa2c", centralised=True, ppo=False),
    "ippo": _ac_variant("ippo", centralised=False, ppo=True),
    "mappo": _ac_variant("mappo", centralised=True, ppo=True),
}
DQN_FAMILY = {"idqn", "vdn", "qmix"}
# CooperativeReward is applied OUTERMOST (after RecordEpisodeStatistics), as
# the reference's make_env does for named wrappers (utils/envs.py:47-54) —
# episode stats therefore record pre-sum per-agent rewards.
COOP_ALGOS = {"vdn", "qmix"}

PARALLEL_ENVS = 10  # configs/algorithm/ia2c.yaml: env.parallel_envs


class GateLogger:
    """Minimal logger satisfying the surface the reference train loops use
    (`watch`, `log_metrics`); squashes infos with the reference's own
    squash_info and appends rows to a CSV."""

    def __init__(self, out_csv: Path, total_steps: int):
        self.out_csv = out_csv
        self.total_steps = total_steps
        self.rows = []
        self.t0 = time.time()

    def watch(self, model):
        pass

    def log_metrics(self, infos):
        from marlbase.utils.loggers import squash_info

        row = squash_info(infos)
        row["wall_time_s"] = round(time.time() - self.t0, 1)
        self.rows.append(row)
        step = row.get("environment_steps", 0)
        ret = row.get("mean_episode_returns", float("nan"))
        fps = step / max(row["wall_time_s"], 1e-9)
        print(
            f"  step {step:>9}/{self.total_steps}  mean_episode_returns "
            f"{ret:.3f}  fps {fps:,.0f}",
            flush=True,
        )
        self.flush()

    def flush(self):
        keys = sorted({k for r in self.rows for k in r})
        self.out_csv.parent.mkdir(parents=True, exist_ok=True)
        with open(self.out_csv, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=keys)
            w.writeheader()
            w.writerows(self.rows)


def build_single_env(
    seed: int,
    cooperative: bool = False,
    env_name: str = ENV_NAME,
    time_limit: int = TIME_LIMIT,
    standardise_rewards: bool = False,
):
    # Wrapper order mirrors the reference's make_env (utils/envs.py:23-56):
    # base [-> SMACliteWrapper, whose reward-replication + info["action_mask"]
    # contract GymnasiumEnv provides natively] -> TimeLimit -> episode stats
    # -> named wrappers (CooperativeReward outermost for vdn/qmix).
    from codebase_tpu.envs import wrappers as W
    from codebase_tpu.envs.factory import make_base_env
    from codebase_tpu.envs.gym_compat import GymnasiumEnv
    from marlbase.utils import wrappers as mwrappers

    base = W.TimeLimit(make_base_env(env_name), limit=time_limit)
    env = GymnasiumEnv(base, seed=seed)
    env = mwrappers.RecordEpisodeStatistics(env)
    if standardise_rewards:
        # the reference applies StandardiseReward AFTER episode stats
        # (utils/envs.py:44-46), so logged returns stay raw
        env = mwrappers.StandardiseReward(env)
    if cooperative:
        env = mwrappers.CooperativeReward(env)
    env.reset(seed=seed)
    return env


def build_vector_env(
    seed: int,
    env_name: str = ENV_NAME,
    time_limit: int = TIME_LIMIT,
    parallel_envs: int = PARALLEL_ENVS,
):
    from codebase_tpu.envs import wrappers as W
    from codebase_tpu.envs.factory import make_base_env
    from codebase_tpu.envs.gym_compat import JaxVectorEnv

    base = W.TimeLimit(make_base_env(env_name), limit=time_limit)
    return JaxVectorEnv(base, parallel_envs, seed=seed)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--algo", choices=sorted(ALGO_CFGS), required=True)
    ap.add_argument("--seed", type=int, required=True)
    ap.add_argument("--env", default=ENV_NAME)
    ap.add_argument("--time-limit", type=int, default=TIME_LIMIT)
    ap.add_argument("--parallel-envs", type=int, default=PARALLEL_ENVS)
    ap.add_argument("--total-steps", type=int, default=2_000_000)
    ap.add_argument("--eval-interval", type=int, default=20_000)
    ap.add_argument("--eval-episodes", type=int, default=100)
    ap.add_argument("--out", type=Path, default=REPO / "outputs" / "ref_gate")
    ap.add_argument(
        "--save-interval",
        type=int,
        default=0,
        help="checkpoint every N steps (the reference writes torch "
        "state_dicts to ./checkpoints relative to CWD); 0 disables",
    )
    args = ap.parse_args()

    import numpy as np
    import torch

    torch.set_num_threads(1)  # as the reference pins (marlbase/run.py:29)
    torch.manual_seed(args.seed)
    np.random.seed(args.seed)
    import random

    random.seed(args.seed)

    out_csv = args.out / f"{args.algo}_seed{args.seed}.csv"
    logger = GateLogger(out_csv, args.total_steps)
    common = dict(
        total_steps=args.total_steps,
        eval_interval=args.eval_interval,
        eval_episodes=args.eval_episodes,
        log_interval=args.eval_interval,
    )
    if args.save_interval:
        common["save_interval"] = args.save_interval

    t0 = time.time()
    coop = args.algo in COOP_ALGOS
    cfg = {**ALGO_CFGS[args.algo], **common}
    if args.algo in DQN_FAMILY:
        from marlbase.dqn import train as ref_train

        env = build_single_env(
            args.seed, cooperative=coop, env_name=args.env,
            time_limit=args.time_limit,
        )
        eval_env = build_single_env(
            args.seed + 10_000, cooperative=coop, env_name=args.env,
            time_limit=args.time_limit,
        )
        ref_train.main(env, eval_env, logger, args.time_limit, **cfg)
    else:
        from marlbase.ac import train as ref_train

        envs = build_vector_env(
            args.seed, env_name=args.env, time_limit=args.time_limit,
            parallel_envs=args.parallel_envs,
        )
        eval_env = build_single_env(
            args.seed + 10_000, env_name=args.env, time_limit=args.time_limit
        )
        ref_train.main(envs, eval_env, logger, args.time_limit, **cfg)

    wall = time.time() - t0
    tail = [
        r["mean_episode_returns"]
        for r in logger.rows[-5:]
        if "mean_episode_returns" in r
    ]
    summary = {
        "algo": args.algo,
        "seed": args.seed,
        "env": args.env,
        "total_steps": args.total_steps,
        "final_mean_episode_returns": float(np.mean(tail)) if tail else None,
        "fps": round(args.total_steps / wall, 1),
        "wall_s": round(wall, 1),
        "csv": str(out_csv),
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
