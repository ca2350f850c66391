"""QMIX update-chain parity vs the reference, f64 bit-faithful (round 4).

Round 3 proved the IDQN chain (loss -> grad -> clip -> Adam -> target
update) bit-faithful; IDQN and VDN pass their learning gates, QMIX
diverges (fw lifts off on some seeds, the reference never does). This
script extends the update-parity methodology to the MIXER path: identical
params (framework init copied into the reference's torch QMixNetwork),
identical synthetic cooperative batches, N sequential f64 updates on both
stacks, comparing losses and final parameters.

If this matches to ~1e-8 relative (as IDQN did), the QMIX translation is
exact and the learning-curve divergence must come from numerics outside
the update chain (e.g. TPU f32 matmul rounding vs torch CPU true f32 — see
scripts/ref_gate/run_fw_gate_precision.sh) or from dynamics-level seed
sensitivity. If it does not match, the diff localises the translation bug.

Usage: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python \
    scripts/diag/qmix_update_parity.py [--updates 200]
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

N_AGENTS = 2
OBS_DIM = 15
N_ACTIONS = 6
T = 25
BATCH = 32
LR = 3e-4
GAMMA = 0.99
CLIP = 1.0
TARGET_INTERVAL = 200
EMBED, HLAYERS, HEMBED = 64, 2, 32


def make_batches(rng, n):
    sys.path.insert(0, str(REPO / "scripts" / "diag"))
    from update_parity import make_batches as mk

    batches = mk(rng, n)
    # cooperative: all agents share the team reward (CooperativeReward)
    for b in batches:
        team = b["rewards"].sum(axis=0, keepdims=True)
        b["rewards"] = np.repeat(team, N_AGENTS, axis=0) * b["filled"][None]
    return batches


def run_framework(params0, batches):
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import optax

    from codebase_tpu.algos.common import make_optimizer, tree_where
    from codebase_tpu.algos.dqn import DQNModel
    from codebase_tpu.models.mixers import QMixer
    from codebase_tpu.models.multi_agent import MultiAgentNetwork

    critic = MultiAgentNetwork.create(
        input_sizes=(OBS_DIM,) * N_AGENTS,
        hidden_dims=(128, 128),
        output_sizes=(N_ACTIONS,) * N_AGENTS,
        parameter_sharing=False,
        use_rnn=False,
    )
    mixer = QMixer(
        n_agents=N_AGENTS, state_dim=N_AGENTS * OBS_DIM,
        embed_dim=EMBED, hypernet_layers=HLAYERS, hypernet_embed=HEMBED,
    )
    model = DQNModel(
        critic=critic, mixer=mixer, mixer_type="qmix", gamma=GAMMA,
        double_q=True, standardise_returns=False, use_action_masks=False,
    )
    opt = make_optimizer("Adam", LR, CLIP, clip_mask={"critic": True, "mixer": False})
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float64), params0)
    target = jax.tree.map(jnp.copy, params)
    opt_state = opt.init(params)
    rms = model.init_rms()

    @jax.jit
    def step(params, target, opt_state, rms, batch, updates, last_tgt):
        (loss, rms), grads = jax.value_and_grad(model.loss, has_aux=True)(
            params, target, batch, rms
        )
        upd, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, upd)
        updates = updates + 1
        do_hard = (updates - last_tgt) >= TARGET_INTERVAL
        target = tree_where(do_hard, params, target)
        last_tgt = jnp.where(do_hard, updates, last_tgt)
        return params, target, opt_state, rms, loss, updates, last_tgt

    losses = []
    updates = jnp.asarray(0)
    last_tgt = jnp.asarray(0)
    for b in batches:
        jb = {k: jnp.asarray(v, jnp.float64 if v.dtype != np.int32 else None) for k, v in b.items()}
        jb["action_mask"] = None
        params, target, opt_state, rms, loss, updates, last_tgt = step(
            params, target, opt_state, rms, jb, updates, last_tgt
        )
        losses.append(float(loss))
    return np.array(losses), jax.device_get(params)


def run_reference(params0, batches):
    import torch
    from gymnasium import spaces
    from omegaconf import DictConfig

    from marlbase.dqn.model import QMixNetwork
    from marlbase.dqn.train import Batch

    torch.set_num_threads(1)
    torch.set_default_dtype(torch.float64)
    obs_space = spaces.Tuple(
        [spaces.Box(-np.inf, np.inf, (OBS_DIM,)) for _ in range(N_AGENTS)]
    )
    act_space = spaces.Tuple([spaces.Discrete(N_ACTIONS) for _ in range(N_AGENTS)])
    cfg = DictConfig(
        dict(
            optimizer="Adam", lr=LR, gamma=GAMMA, grad_clip=CLIP,
            target_update_interval_or_tau=TARGET_INTERVAL,
            double_q=True, standardise_returns=False,
        )
    )
    net = QMixNetwork(
        obs_space, act_space, cfg,
        layers=[128, 128], parameter_sharing=False, use_rnn=False,
        use_orthogonal_init=True, device="cpu",
        mixing=dict(embed_dim=EMBED, hypernet_layers=HLAYERS, hypernet_embed=HEMBED),
    )
    net = net.double()

    def copy_linear(lin, p):
        lin.weight.data.copy_(torch.from_numpy(np.asarray(p["w"], np.float64).T.copy()))
        lin.bias.data.copy_(torch.from_numpy(np.asarray(p["b"], np.float64).copy()))

    with torch.no_grad():
        for g in range(N_AGENTS):
            seq = net.critic.independent[g].network
            linear_idx = [i for i, m in enumerate(seq) if isinstance(m, torch.nn.Linear)]
            for j, li in enumerate(linear_idx):
                copy_linear(seq[li], jax_layer(params0, "critic", g, j))
        mp = params0["mixer"]
        copy_linear(net.mixer.hyper_w_1[0], mp["hyper_w_1"][0])
        copy_linear(net.mixer.hyper_w_1[2], mp["hyper_w_1"][1])
        copy_linear(net.mixer.hyper_w_final[0], mp["hyper_w_final"][0])
        copy_linear(net.mixer.hyper_w_final[2], mp["hyper_w_final"][1])
        copy_linear(net.mixer.hyper_b_1, mp["hyper_b_1"])
        copy_linear(net.mixer.V[0], mp["v"][0])
        copy_linear(net.mixer.V[2], mp["v"][1])
    net.hard_update()
    # rebuild the optimizer AFTER the param copy so Adam state indexes the
    # copied tensors (QMixNetwork built its optimizer in __init__)
    net.optimizer = torch.optim.Adam(
        list(net.critic.parameters()) + list(net.mixer.parameters()), lr=LR
    )  # exactly the reference's own param set (`dqn/model.py:370-372`)

    losses = []
    for b in batches:
        obss = torch.from_numpy(b["obss"].astype(np.float64))
        batch = Batch(
            obss=obss,
            actions=torch.from_numpy(b["actions"].astype(np.int64)),
            rewards=torch.from_numpy(b["rewards"].astype(np.float64)),
            dones=torch.from_numpy(b["dones"].astype(np.float64)),
            filled=torch.from_numpy(b["filled"].astype(np.float64)),
            action_mask=None,
        )
        metrics = net.update(batch)
        losses.append(metrics["loss"])
    out = {}
    for g in range(N_AGENTS):
        seq = net.critic.independent[g].network
        linear_idx = [i for i, m in enumerate(seq) if isinstance(m, torch.nn.Linear)]
        for j, li in enumerate(linear_idx):
            out.setdefault(j, {"w": [], "b": []})
            out[j]["w"].append(seq[li].weight.detach().numpy().T)
            out[j]["b"].append(seq[li].bias.detach().numpy())
    mixer_w1 = net.mixer.hyper_w_1[2].weight.detach().numpy().T
    return np.array(losses), out, mixer_w1


def jax_layer(params, part, g, j):
    layer = params[part]["layers"][j]
    return {"w": np.asarray(layer["w"][g]), "b": np.asarray(layer["b"][g])}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--updates", type=int, default=200)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_enable_x64", True)

    from codebase_tpu.models.mixers import QMixer
    from codebase_tpu.models.multi_agent import MultiAgentNetwork

    critic = MultiAgentNetwork.create(
        input_sizes=(OBS_DIM,) * N_AGENTS,
        hidden_dims=(128, 128),
        output_sizes=(N_ACTIONS,) * N_AGENTS,
        parameter_sharing=False,
        use_rnn=False,
    )
    mixer = QMixer(
        n_agents=N_AGENTS, state_dim=N_AGENTS * OBS_DIM,
        embed_dim=EMBED, hypernet_layers=HLAYERS, hypernet_embed=HEMBED,
    )
    params0 = jax.device_get(
        {
            "critic": critic.init(jax.random.PRNGKey(0)),
            "mixer": mixer.init(jax.random.PRNGKey(1)),
        }
    )
    rng = np.random.default_rng(7)
    batches = make_batches(rng, args.updates)

    fw_losses, fw_params = run_framework(params0, batches)
    ref_losses, ref_params, ref_mixer_w1 = run_reference(params0, batches)

    loss_rel = np.abs(fw_losses - ref_losses) / np.maximum(np.abs(ref_losses), 1e-12)
    w_rel = []
    for j in range(3):
        fw_w = np.asarray(fw_params["critic"]["layers"][j]["w"])
        ref_w = np.stack(ref_params[j]["w"])
        w_rel.append(float(np.max(np.abs(fw_w - ref_w) / (np.abs(ref_w) + 1e-12))))
    fw_mixer_w1 = np.asarray(fw_params["mixer"]["hyper_w_1"][1]["w"])
    mixer_rel = float(
        np.max(np.abs(fw_mixer_w1 - ref_mixer_w1) / (np.abs(ref_mixer_w1) + 1e-12))
    )
    print(
        json.dumps(
            {
                "updates": args.updates,
                "max_loss_rel": float(loss_rel.max()),
                "final_loss_rel": float(loss_rel[-1]),
                "max_critic_w_rel": max(w_rel),
                "mixer_w1_rel": mixer_rel,
                "bit_faithful": bool(loss_rel.max() < 1e-6 and max(w_rel) < 1e-6),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
