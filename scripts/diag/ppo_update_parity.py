"""Differential parity: the framework's AC/PPO update chain vs the
reference's torch implementation, on IDENTICAL params and IDENTICAL batches.

Round-4 verdict follow-up ("next round" item 3): ippo and maa2c lean
low-side in the learning gate (fw wins 1/5 and 2/5 pairs) — the same early-
warning shape that round 3's IDQN hunt started from, and the PPO path
(epoch loop, old-log-prob freeze, clip semantics,
`/root/reference/marlbase/ac/model.py:265-352`) had no f64 update-parity
diagnosis the way the DQN and QMIX paths do (`update_parity.py`,
`qmix_update_parity.py`). This script closes that:

  1. init framework params (orthogonal init, both actor and critic);
  2. copy them into the reference's unmodified `marlbase.ac.model`
     A2CNetwork/PPONetwork (imported in place from /root/reference,
     torch CPU), target critic synced;
  3. feed both sides the SAME randomly generated (T, E) rollout batches for
     N sequential updates — target-critic bootstrap -> n-step returns ->
     [PPO: frozen old log-probs -> num_epochs clipped-surrogate epochs |
     A2C: single policy-gradient step] -> Adam -> hard target refresh on the
     reference's PRE-increment step cadence (`ac/model.py:233-239`);
  4. report per-update loss deltas and final actor/critic param deltas.

Run with JAX_ENABLE_X64=1 for the bit-faithfulness assertion (torch is put
in float64 too); in f32 the report shows accumulated rounding drift only.

Usage:
    PYTHONPATH=/root/repo JAX_PLATFORMS=cpu [JAX_ENABLE_X64=1] \
      python scripts/diag/ppo_update_parity.py --algo ippo [--updates 200] \
        [--max-rel-loss-delta 1e-6]
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO / "scripts" / "ref_shims"))
sys.path.insert(0, "/root/reference")
sys.path.insert(0, str(REPO))

import numpy as np

N_AGENTS = 2
OBS_DIM = 15  # Foraging-8x8-2p-3f per-agent obs dim
N_ACTIONS = 6
T = 25
E = 10  # parallel_envs (configs/algorithm/ia2c.yaml)
LR = 3e-4
GAMMA = 0.99
N_STEPS = 5
ENTROPY_COEF = 0.001
VALUE_COEF = 0.5
TARGET_INTERVAL = 200
NUM_EPOCHS = 4
PPO_CLIP = 0.2
N_UPDATES = 200

ALGOS = {
    # algo -> (centralised_critic, ppo)
    "ia2c": (False, False),
    "maa2c": (True, False),
    "ippo": (False, True),
    "mappo": (True, True),
}


def make_batches(rng, n):
    """Synthetic rollout batches with the reference collector's exact
    layout (`ac/train.py:14-121`): obss (T+1, E, N*D) concatenated over
    agents, actions (T, E, N), rewards (T, E, N), dones (T+1, E) with a
    single 1 at each env's episode end, filled (T, E)."""
    batches = []
    for _ in range(n):
        obss = rng.uniform(0, 8, size=(T + 1, E, N_AGENTS, OBS_DIM)).astype(np.float32)
        actions = rng.integers(0, N_ACTIONS, size=(T, E, N_AGENTS)).astype(np.int32)
        rewards = (
            (rng.random((T, E, N_AGENTS)) < 0.05)
            * rng.random((T, E, N_AGENTS))
        ).astype(np.float32)
        lengths = rng.integers(5, T + 1, size=(E,))
        filled = (np.arange(T)[:, None] < lengths[None, :]).astype(np.float32)
        dones = np.zeros((T + 1, E), np.float32)
        dones[lengths, np.arange(E)] = 1.0
        # past an env's episode end the reference stops writing (the
        # `running` mask): obs/rew/act rows stay at their init value
        obss[1:] *= filled[:, :, None, None]
        rewards *= filled[..., None]
        actions = (actions * filled[..., None]).astype(np.int32)
        batches.append(
            dict(obss=obss, actions=actions, rewards=rewards, dones=dones, filled=filled)
        )
    # the reference advances its step counter by t * parallel_envs per
    # update (ac/train.py:204) with t = the longest episode in the batch
    steps_per_batch = [int((b["filled"].sum(0)).max()) * E for b in batches]
    return batches, steps_per_batch


def _model_cfgs(algo):
    centralised, ppo = ALGOS[algo]
    actor = dict(
        layers=[128, 128], parameter_sharing=False,
        use_orthogonal_init=True, use_rnn=False,
    )
    critic = dict(actor, centralised=centralised)
    return actor, critic, ppo


def run_framework(algo, params0, batches, steps_per_batch):
    import jax
    import jax.numpy as jnp
    import optax

    from codebase_tpu.algos.ac import ACModel
    from codebase_tpu.algos.common import make_optimizer, tree_where
    from codebase_tpu.config import load_config
    from codebase_tpu.envs.factory import make_env

    env = make_env("lbforaging:Foraging-8x8-2p-3f-v3", time_limit=T)
    cfg = load_config(
        [f"+algorithm={algo}", "env.name=Foraging-8x8-2p-3f-v3", "env.time_limit=25"]
    )
    model = ACModel.create(env, cfg.algorithm.model, cfg.algorithm)
    assert model.ppo == ALGOS[algo][1]
    assert model.centralised_critic == ALGOS[algo][0]

    opt = make_optimizer("adam", LR, False)
    # under x64 the transplanted params must be upcast: optax.apply_updates
    # casts updates back to the PARAM dtype, so f32 params would re-round
    # every update (1e-7/step — enough for PPO's clip boundary to amplify
    # into macroscopic trajectory divergence by ~200 updates) while the
    # torch side runs f64 end-to-end
    to_dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    params = jax.tree.map(lambda x: jnp.asarray(x, to_dtype), params0)
    target_critic = jax.tree.map(jnp.copy, params["critic"])
    opt_state = opt.init(params)
    rms = model.init_rms()

    @jax.jit
    def step(params, target_critic, opt_state, rms, batch, env_steps):
        # mirror of the `update` closure in algos/ac.py:build_train_functions
        obs_agents = jnp.moveaxis(batch["obss"], 2, 0)  # (N, T+1, E, D)
        amask = jnp.ones(
            (N_AGENTS, T + 1, E, N_ACTIONS), batch["obss"].dtype
        )
        returns, rms2 = model.compute_returns(
            target_critic, obs_agents, batch["rewards"], batch["dones"], rms
        )
        returns = jax.lax.stop_gradient(returns)
        obs_in = obs_agents[:, :-1]
        amask_in = amask[:, :-1]
        if not model.ppo:
            (loss, metrics), grads = jax.value_and_grad(model.a2c_loss, has_aux=True)(
                params, returns, obs_in, batch["actions"], amask_in, batch["filled"]
            )
            upd, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, upd)
            losses = metrics["loss"][None]
        else:
            old_lp, _ = model.log_probs_entropy(
                params["actor"], obs_in, batch["actions"], amask_in
            )
            old_lp = jax.lax.stop_gradient(old_lp)

            def epoch(carry, _):
                params, opt_state = carry
                (loss, metrics), grads = jax.value_and_grad(
                    model.ppo_loss, has_aux=True
                )(params, returns, old_lp, obs_in, batch["actions"], amask_in,
                  batch["filled"])
                upd, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, upd)
                return (params, opt_state), metrics["loss"]

            (params, opt_state), losses = jax.lax.scan(
                epoch, (params, opt_state), None, length=NUM_EPOCHS
            )
        do_hard = (env_steps % TARGET_INTERVAL) == 0
        target_critic = tree_where(do_hard, params["critic"], target_critic)
        return params, target_critic, opt_state, rms2, losses

    losses = []
    env_steps = 0
    for b, ds in zip(batches, steps_per_batch):
        jb = {k: jnp.asarray(v) for k, v in b.items()}
        params, target_critic, opt_state, rms, ls = step(
            params, target_critic, opt_state, rms, jb, jnp.asarray(env_steps)
        )
        losses.append(np.mean(jax.device_get(ls)))
        env_steps += ds
    return np.array(losses), jax.device_get(params)


def run_reference(algo, params0, batches, steps_per_batch):
    import torch
    from gymnasium import spaces
    from omegaconf import DictConfig

    from marlbase.ac.model import A2CNetwork, PPONetwork
    from marlbase.ac.train import Batch

    torch.set_num_threads(1)
    centralised, ppo = ALGOS[algo]
    obs_space = spaces.Tuple(
        [spaces.Box(-np.inf, np.inf, (OBS_DIM,)) for _ in range(N_AGENTS)]
    )
    act_space = spaces.Tuple([spaces.Discrete(N_ACTIONS) for _ in range(N_AGENTS)])
    cfg = DictConfig(
        dict(
            optimizer="Adam",
            lr=LR,
            gamma=GAMMA,
            grad_clip=False,
            n_steps=N_STEPS,
            entropy_coef=ENTROPY_COEF,
            value_loss_coef=VALUE_COEF,
            target_update_interval_or_tau=TARGET_INTERVAL,
            standardise_returns=False,
            num_epochs=NUM_EPOCHS,
            ppo_clip=PPO_CLIP,
        )
    )
    actor_cfg, critic_cfg, _ = _model_cfgs(algo)
    cls = PPONetwork if ppo else A2CNetwork
    net = cls(
        obs_space, act_space, cfg, DictConfig(actor_cfg), DictConfig(critic_cfg), "cpu"
    )

    def copy_net(torch_container, fw_tree):
        with torch.no_grad():
            for g in range(N_AGENTS):
                seq = torch_container.independent[g].network
                linear_idx = [
                    i for i, m in enumerate(seq) if isinstance(m, torch.nn.Linear)
                ]
                for j, li in enumerate(linear_idx):
                    w = np.asarray(fw_tree["layers"][j]["w"][g]).T
                    b = np.asarray(fw_tree["layers"][j]["b"][g])
                    seq[li].weight.copy_(torch.from_numpy(w.copy()))
                    seq[li].bias.copy_(torch.from_numpy(b.copy()))

    copy_net(net.actor, params0["actor"])
    copy_net(net.critic, params0["critic"])
    net.soft_update(1.0)

    losses = []
    step = 0
    dt = torch.get_default_dtype()
    for b, ds in zip(batches, steps_per_batch):
        obss = torch.from_numpy(
            b["obss"].reshape(T + 1, E, N_AGENTS * OBS_DIM)
        ).to(dt)
        batch = Batch(
            obss=obss,
            actions=torch.from_numpy(b["actions"].astype(np.int64)),
            rewards=torch.from_numpy(b["rewards"]).to(dt),
            dones=torch.from_numpy(b["dones"]).to(dt),
            filled=torch.from_numpy(b["filled"]).to(dt),
            action_masks=None,
        )
        metrics = net.update(batch, step)
        losses.append(metrics["loss"])
        step += ds

    def dump_net(torch_container):
        out = []
        for j in range(3):
            ws, bs = [], []
            for g in range(N_AGENTS):
                seq = torch_container.independent[g].network
                linear_idx = [
                    i for i, m in enumerate(seq) if isinstance(m, torch.nn.Linear)
                ]
                ws.append(seq[linear_idx[j]].weight.detach().numpy().T)
                bs.append(seq[linear_idx[j]].bias.detach().numpy())
            out.append({"w": np.stack(ws), "b": np.stack(bs)})
        return out

    return np.array(losses), {"actor": dump_net(net.actor), "critic": dump_net(net.critic)}


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--algo", choices=sorted(ALGOS), default="ippo")
    ap.add_argument("--updates", type=int, default=N_UPDATES)
    ap.add_argument(
        "--max-rel-loss-delta",
        type=float,
        default=None,
        help="exit nonzero if any per-update relative loss delta exceeds "
        "this (use with JAX_ENABLE_X64=1 for the exactness assertion)",
    )
    args = ap.parse_args()

    import jax

    f64 = jax.config.jax_enable_x64
    rng = np.random.default_rng(0)
    batches, steps_per_batch = make_batches(rng, args.updates)
    if f64:
        import torch

        torch.set_default_dtype(torch.float64)
        batches = [
            {
                k: v.astype(np.float64) if v.dtype == np.float32 else v
                for k, v in b.items()
            }
            for b in batches
        ]

    from codebase_tpu.algos.ac import ACModel
    from codebase_tpu.config import load_config
    from codebase_tpu.envs.factory import make_env

    env = make_env("lbforaging:Foraging-8x8-2p-3f-v3", time_limit=T)
    cfg = load_config(
        [f"+algorithm={args.algo}", "env.name=Foraging-8x8-2p-3f-v3", "env.time_limit=25"]
    )
    model = ACModel.create(env, cfg.algorithm.model, cfg.algorithm)
    params0 = jax.device_get(model.init_params(jax.random.PRNGKey(0)))

    fw_losses, fw_params = run_framework(args.algo, params0, batches, steps_per_batch)
    ref_losses, ref_params = run_reference(args.algo, params0, batches, steps_per_batch)

    dl = np.abs(fw_losses - ref_losses)
    rel = dl / np.maximum(np.abs(ref_losses), 1e-9)
    print(f"[{args.algo}] losses: first {fw_losses[0]:.17g} vs {ref_losses[0]:.17g}")
    if args.updates <= 20:
        for i, (a, b) in enumerate(zip(fw_losses, ref_losses)):
            print(f"  upd {i}: fw {a:.17g} ref {b:.17g} |d| {abs(a-b):.3e}")
    print(
        f"loss |delta| max {dl.max():.3e} @ update {dl.argmax()}; rel max {rel.max():.3e}"
    )
    worst = 0.0
    for part in ("actor", "critic"):
        for j in range(3):
            fw_w = fw_params[part]["layers"][j]["w"]
            ref_w = ref_params[part][j]["w"]
            dw = np.abs(fw_w - ref_w).max()
            scale = np.abs(ref_w).max()
            worst = max(worst, dw / scale)
            print(
                f"{part} layer {j}: param |delta| max {dw:.3e} "
                f"(scale {scale:.3f}, rel {dw/scale:.3e})"
            )
    if args.max_rel_loss_delta is not None:
        assert rel.max() <= args.max_rel_loss_delta, (
            f"loss parity violated: rel max {rel.max():.3e} > "
            f"{args.max_rel_loss_delta:.1e}"
        )
        print(f"PASS: all {args.updates} updates within rel {args.max_rel_loss_delta:.1e}")


if __name__ == "__main__":
    main()
