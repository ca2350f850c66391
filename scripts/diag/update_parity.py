"""Differential parity: the framework's whole DQN update chain vs the
reference's torch implementation, on IDENTICAL params and IDENTICAL batches.

Round-2 verdict: the IDQN learning gate shows a systematic final-return
deficit (~0.06) vs the reference at matched hyperparameters. Collection
cadence is already verified equal (updates / epsilon / episode-length
counters match); this script isolates the numerical update itself:

  1. init framework params (orthogonal, gain sqrt(2), zero bias);
  2. copy them into the reference's unmodified `marlbase.dqn.model.QNetwork`
     (imported in place from /root/reference, torch CPU);
  3. feed both sides the SAME randomly generated episodic batches for N
     sequential Adam updates (loss -> grad -> global-norm clip -> Adam ->
     target maintenance);
  4. report per-step loss deltas and final param deltas.

Any translation bug in loss semantics, masking, double-Q selection, clipping
or optimizer config shows up as a growing divergence. Agreement to float
tolerance pins the gate deficit on the data/exploration side instead.

Usage: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python scripts/diag/update_parity.py
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
BATCH = 32
LR = 3e-4
GAMMA = 0.99
CLIP = 1.0
TARGET_INTERVAL = 200
N_UPDATES = 400


def make_batches(rng, n):
    batches = []
    for _ in range(n):
        obss = rng.uniform(0, 8, size=(N_AGENTS, T + 1, BATCH, OBS_DIM)).astype(np.float32)
        actions = rng.integers(0, N_ACTIONS, size=(N_AGENTS, T, BATCH)).astype(np.int32)
        rewards = (rng.random((N_AGENTS, T, BATCH)) < 0.05).astype(np.float32) * rng.random(
            (N_AGENTS, T, BATCH)
        ).astype(np.float32)
        # episodes of random length 5..T: filled mask + done at the last step
        lengths = rng.integers(5, T + 1, size=(BATCH,))
        filled = (np.arange(T)[:, None] < lengths[None, :]).astype(np.float32)
        dones = np.zeros((T + 1, BATCH), np.float32)
        dones[lengths, np.arange(BATCH)] = 1.0
        # zero out data past episode end, as the replay stores it
        obss[:, 1:] *= filled[None, :, :, None]
        rewards *= filled[None]
        actions = (actions * filled[None]).astype(np.int32)
        batches.append(dict(obss=obss, actions=actions, rewards=rewards, dones=dones, filled=filled))
    return batches


def run_framework(params0, batches):
    import jax
    import jax.numpy as jnp
    import optax

    from codebase_tpu.algos.common import make_optimizer, tree_where
    from codebase_tpu.algos.dqn import DQNModel
    from codebase_tpu.models.multi_agent import MultiAgentNetwork
    from codebase_tpu.ops.running_stats import RunningMeanStd

    critic = MultiAgentNetwork.create(
        input_sizes=[OBS_DIM] * N_AGENTS,
        hidden_dims=(128, 128),
        output_sizes=[N_ACTIONS] * N_AGENTS,
        parameter_sharing=False,
        use_rnn=False,
        use_orthogonal_init=True,
    )
    model = DQNModel(
        critic=critic,
        mixer=None,
        mixer_type="none",
        gamma=GAMMA,
        double_q=True,
        standardise_returns=False,
        use_action_masks=False,
    )
    opt = make_optimizer("adam", LR, CLIP)
    params = jax.tree.map(jnp.asarray, params0)
    target = jax.tree.map(jnp.copy, params)
    opt_state = opt.init(params)
    rms = RunningMeanStd.init((N_AGENTS,))

    @jax.jit
    def step(params, target, opt_state, rms, batch, updates, last_tgt):
        batch = dict(batch, action_mask=jnp.ones((N_AGENTS, T + 1, BATCH, N_ACTIONS), jnp.float32))
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
        params, target, opt_state, rms, loss, updates, last_tgt = step(
            params, target, opt_state, rms, {k: jnp.asarray(v) for k, v in b.items()}, updates, last_tgt
        )
        losses.append(float(loss))
    return np.array(losses), jax.device_get(params)


def run_reference(params0, batches):
    import torch
    from gymnasium import spaces
    from omegaconf import DictConfig

    from marlbase.dqn.model import QNetwork
    from marlbase.dqn.train import Batch

    torch.set_num_threads(1)
    obs_space = spaces.Tuple([spaces.Box(-np.inf, np.inf, (OBS_DIM,)) for _ in range(N_AGENTS)])
    act_space = spaces.Tuple([spaces.Discrete(N_ACTIONS) for _ in range(N_AGENTS)])
    cfg = DictConfig(
        dict(
            optimizer="Adam",
            lr=LR,
            gamma=GAMMA,
            grad_clip=CLIP,
            target_update_interval_or_tau=TARGET_INTERVAL,
            double_q=True,
            standardise_returns=False,
        )
    )
    qnet = QNetwork(
        obs_space,
        act_space,
        cfg,
        layers=[128, 128],
        parameter_sharing=False,
        use_rnn=False,
        use_orthogonal_init=True,
        device="cpu",
    )
    # copy the framework's stacked params into per-agent torch Linears
    with torch.no_grad():
        for g in range(N_AGENTS):
            seq = qnet.critic.independent[g].network
            linear_idx = [i for i, m in enumerate(seq) if isinstance(m, torch.nn.Linear)]
            for j, li in enumerate(linear_idx):
                w = np.asarray(params0["critic"]["layers"][j]["w"][g]).T
                b = np.asarray(params0["critic"]["layers"][j]["b"][g])
                seq[li].weight.copy_(torch.from_numpy(w.copy()))
                seq[li].bias.copy_(torch.from_numpy(b.copy()))
    qnet.hard_update()

    losses = []
    for bdict in batches:
        obss = [torch.from_numpy(bdict["obss"][i]) for i in range(N_AGENTS)]
        batch = Batch(
            obss=obss,
            actions=torch.from_numpy(bdict["actions"].astype(np.int64)),
            rewards=torch.from_numpy(bdict["rewards"]),
            dones=torch.from_numpy(bdict["dones"]),
            filled=torch.from_numpy(bdict["filled"]),
            action_mask=None,
        )
        metrics = qnet.update(batch)
        losses.append(metrics["loss"])

    out = {}
    for g in range(N_AGENTS):
        seq = qnet.critic.independent[g].network
        linear_idx = [i for i, m in enumerate(seq) if isinstance(m, torch.nn.Linear)]
        for j, li in enumerate(linear_idx):
            out.setdefault(j, {"w": [], "b": []})
            out[j]["w"].append(seq[li].weight.detach().numpy().T)
            out[j]["b"].append(seq[li].bias.detach().numpy())
    return np.array(losses), out


def main():
    import argparse

    ap = argparse.ArgumentParser()
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
    batches = make_batches(rng, args.updates)
    if f64:
        import torch

        torch.set_default_dtype(torch.float64)
        batches = [
            {k: v.astype(np.float64) if v.dtype == np.float32 else v for k, v in b.items()}
            for b in batches
        ]

    # framework init (the side whose init we transplant)
    from codebase_tpu.models.multi_agent import MultiAgentNetwork

    critic = MultiAgentNetwork.create(
        input_sizes=[OBS_DIM] * N_AGENTS,
        hidden_dims=(128, 128),
        output_sizes=[N_ACTIONS] * N_AGENTS,
        parameter_sharing=False,
    )
    params0 = jax.device_get({"critic": critic.init(jax.random.PRNGKey(0))})

    fw_losses, fw_params = run_framework(params0, batches)
    ref_losses, ref_params = run_reference(params0, batches)

    dl = np.abs(fw_losses - ref_losses)
    rel = dl / np.maximum(np.abs(ref_losses), 1e-9)
    print(f"losses: first {fw_losses[0]:.6f} vs {ref_losses[0]:.6f}")
    print(f"loss |delta| max {dl.max():.3e} @ update {dl.argmax()}; rel max {rel.max():.3e}")
    for j in range(3):
        fw_w = fw_params["critic"]["layers"][j]["w"]
        ref_w = np.stack(ref_params[j]["w"])
        dw = np.abs(fw_w - ref_w).max()
        scale = np.abs(ref_w).max()
        print(f"layer {j}: param |delta| max {dw:.3e} (scale {scale:.3f}, rel {dw/scale:.3e})")


if __name__ == "__main__":
    main()
