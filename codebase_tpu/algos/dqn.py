"""Off-policy value-based family: IDQN, VDN, QMIX — fused on-device.

Reference: `marlbase/dqn/` — `QNetwork`/`VDNetwork`/`QMixNetwork`
(`dqn/model.py`) driven by a python episode loop (`dqn/train.py:298-313`).
Here one jitted `train_iteration` performs: epsilon-greedy rollout of E
parallel episodes (`lax.scan` over time, vmapped envs), replay insertion,
U sampled double-Q updates, and target-network maintenance — no host syncs
inside. The python layer only composes chunks and handles logging/eval.

Loss semantics are exact translations:
- IDQN: per-agent double-Q TD loss over whole episodes, summed across
  agents, `filled`-masked mean (`dqn/model.py:118-163`).
- VDN: chosen/target utilities summed over agents vs team reward
  (`dqn/model.py:224-269`).
- QMIX: monotonic hypernetwork mixing with state = concat of all agent obs
  (`dqn/model.py:374-427`).
- Joint epsilon exploration: ONE coin per env per step flips all agents to
  random actions (`dqn/model.py:105-113`).
- Target update: hard every `interval` updates when interval > 1, else
  Polyak tau (`dqn/model.py:176-196`).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from codebase_tpu.algos.common import (
    early_exit_option,
    make_optimizer,
    soft_update,
    tree_where,
)
from codebase_tpu.envs.api import Environment
from codebase_tpu.envs.vector import collect_episodes
from codebase_tpu.models.distributions import MASK_NEG
from codebase_tpu.models.mixers import QMixer
from codebase_tpu.models.multi_agent import MultiAgentNetwork
from codebase_tpu.envs.wrappers import standardisation_plan
from codebase_tpu.ops.replay import (
    ReplayState,
    batch_to_reference_layout,
    replay_add,
    replay_init,
    replay_sample_many,
)
from codebase_tpu.ops.reward_stream import RewardStream, apply_plan
from codebase_tpu.ops.running_stats import RunningMeanStd
from codebase_tpu.ops.schedules import epsilon_schedule


@struct.dataclass
class DQNTrainState:
    params: Any
    target_params: Any
    opt_state: Any
    buffer: ReplayState
    ret_rms: RunningMeanStd
    key: jnp.ndarray
    env_steps: jnp.ndarray  # () int32
    updates: jnp.ndarray  # () int32
    last_target_update: jnp.ndarray  # () int32
    # persistent per-env reward-standardisation moments (None unless the env
    # stack contains a StandardiseReward marker; see ops/reward_stream.py)
    reward_stream: Optional[RewardStream] = None
    # traced scalar hyperparameters (subset of {"lr","gamma","tau"}) — only
    # populated by vmapped sweeps so one compiled program trains a whole
    # (hyperparam x seed) grid (`codebase_tpu/sweep.py`); None in normal runs
    hyper: Optional[Any] = None


@dataclass(frozen=True)
class DQNModel:
    """Static model spec for the whole value-based family."""

    critic: MultiAgentNetwork
    mixer: Optional[QMixer]  # set iff mixer_type == "qmix"
    mixer_type: str  # "none" | "vdn" | "qmix"
    gamma: float
    double_q: bool
    standardise_returns: bool
    use_action_masks: bool

    @staticmethod
    def create(env: Environment, model_cfg, algo_cfg) -> "DQNModel":
        name = model_cfg.get("name", "qnetwork")
        mixer_type = {"qnetwork": "none", "vdn": "vdn", "qmix": "qmix"}[name]
        critic = MultiAgentNetwork.create(
            input_sizes=env.obs_dims,
            hidden_dims=tuple(model_cfg.layers),
            output_sizes=env.action_dims,
            parameter_sharing=model_cfg.parameter_sharing,
            use_rnn=model_cfg.use_rnn,
            use_orthogonal_init=model_cfg.use_orthogonal_init,
            compute_dtype=str(model_cfg.get("dtype", "float32")),
            fused_rnn=str(model_cfg.get("fused_rnn", "auto")),
        )
        mixer = None
        if mixer_type == "qmix":
            mixing = model_cfg.mixing
            # state = concat of all obs (`dqn/model.py:360`)
            mixer = QMixer(
                n_agents=env.n_agents,
                state_dim=sum(env.obs_dims),
                embed_dim=int(mixing.embed_dim),
                hypernet_layers=int(mixing.hypernet_layers),
                hypernet_embed=int(mixing.hypernet_embed),
            )
        return DQNModel(
            critic=critic,
            mixer=mixer,
            mixer_type=mixer_type,
            gamma=float(algo_cfg.gamma),
            double_q=bool(algo_cfg.double_q),
            standardise_returns=bool(algo_cfg.standardise_returns),
            use_action_masks=env.has_action_mask,
        )

    @property
    def n_agents(self):
        return self.critic.n_agents

    # ------------------------------------------------------------------ init

    def init_params(self, key):
        k1, k2 = jax.random.split(key)
        params = {"critic": self.critic.init(k1)}
        if self.mixer is not None:
            params["mixer"] = self.mixer.init(k2)
        return params

    def init_rms(self):
        shape = (self.n_agents,) if self.mixer_type == "none" else (1,)
        return RunningMeanStd.init(shape)

    # ---------------------------------------------------------------- acting

    def policy(self, params, epsilon):
        """Epsilon-greedy rollout policy for `collect_episodes`.

        carry = RNN hiddens (or None); obs (E, N, D); mask (E, N, A).
        Joint exploration: one coin per env flips every agent to a random
        action (`dqn/model.py:105-113`); when the env provides masks, random
        actions are drawn uniformly over valid ones (`:107-111`).
        """

        def act(carry, obs, mask, key):
            x = jnp.moveaxis(obs, 1, 0)[:, None]  # (N, 1, E, D)
            q, carry = self.critic.apply(params["critic"], x, carry)
            q = q[:, 0]  # (N, E, A)
            amask = jnp.moveaxis(mask, 1, 0)  # (N, E, A)
            if self.use_action_masks:
                q = q * amask + (1.0 - amask) * MASK_NEG
            greedy = jnp.argmax(q, axis=-1)  # (N, E)

            k_coin, k_rand = jax.random.split(key)
            explore = jax.random.uniform(k_coin, (obs.shape[0],)) < epsilon  # (E,)
            if self.use_action_masks:
                rand = jax.random.categorical(
                    k_rand, jnp.where(amask > 0, 0.0, -jnp.inf), axis=-1
                )  # (N, E)
            else:
                rand = jax.random.randint(k_rand, greedy.shape, 0, q.shape[-1])
            actions = jnp.where(explore[None, :], rand, greedy)
            return carry, jnp.moveaxis(actions, 0, 1).astype(jnp.int32)  # (E, N)

        return act

    # ------------------------------------------------------------------ loss

    def loss(self, params, target_params, batch, ret_rms, gamma=None):
        """Episode double-Q TD loss; returns (loss, new_ret_rms).

        `gamma` overrides the model's static discount with a traced scalar
        (vmapped hyperparameter sweeps); None uses `self.gamma`.
        """
        gamma = self.gamma if gamma is None else gamma
        obss = batch["obss"]  # (N, T+1, B, D)
        actions = batch["actions"]  # (N, T, B)
        amask = batch["action_mask"]  # (N, T+1, B, A)

        q_all, _ = self.critic.apply(params["critic"], obss)  # (N, T+1, B, A)
        n_act = q_all.shape[-1]
        # one-hot select instead of take_along_axis: gathers run ~300us on
        # TPU for these shapes, a compare+multiply-reduce over A=|actions|
        # is pure vector work
        a_onehot = jax.nn.one_hot(actions, n_act, dtype=q_all.dtype)  # (N, T, B, A)
        chosen = jnp.sum(q_all[:, :-1] * a_onehot, axis=-1)  # (N, T, B)

        tq_all, _ = self.critic.apply(target_params["critic"], obss)
        tq = tq_all[:, 1:]
        if self.use_action_masks:
            tq = jnp.where(amask[:, 1:] > 0, tq, MASK_NEG)
        if self.double_q:
            qc = jax.lax.stop_gradient(q_all)[:, 1:]
            if self.use_action_masks:
                qc = jnp.where(amask[:, 1:] > 0, qc, MASK_NEG)
            a_prime = jnp.argmax(qc, axis=-1)
            target_qs = jnp.sum(
                tq * jax.nn.one_hot(a_prime, n_act, dtype=tq.dtype), axis=-1
            )
        else:
            target_qs = jnp.max(tq, axis=-1)  # (N, T, B)
        target_qs = jax.lax.stop_gradient(target_qs)

        filled = batch["filled"]  # (T, B)

        if self.mixer_type == "none":
            rewards = batch["rewards"]  # (N, T, B)
            dones = batch["dones"][1:][None]  # (1, T, B)
            if self.standardise_returns:
                # rms over the trailing agent axis (`dqn/model.py:147-158`)
                target_qs = jnp.moveaxis(
                    ret_rms.denormalise(jnp.moveaxis(target_qs, 0, -1)), -1, 0
                )
            returns = rewards + gamma * target_qs * (1.0 - dones)
            if self.standardise_returns:
                ret_rms = ret_rms.update(jnp.moveaxis(returns, 0, -1))
                returns = jnp.moveaxis(ret_rms.normalise(jnp.moveaxis(returns, 0, -1)), -1, 0)
            sq = (chosen - jax.lax.stop_gradient(returns)) ** 2
            loss_tb = jnp.sum(sq, axis=0)  # sum over agents (`dqn/model.py:160-162`)
        else:
            # cooperative: team reward of agent 0 (`dqn/model.py:227-229`)
            rewards = batch["rewards"][0]  # (T, B)
            dones = batch["dones"][1:]  # (T, B)
            if self.mixer_type == "vdn":
                chosen_tot = jnp.sum(chosen, axis=0)  # (T, B)
                target_tot = jnp.sum(target_qs, axis=0)
            else:  # qmix
                # states: concat agent obs -> (T+1, B, N*D) (`dqn/model.py:389,412`)
                states = jnp.concatenate(
                    [obss[i] for i in range(obss.shape[0])], axis=-1
                )
                chosen_tot = self.mixer.apply(params["mixer"], chosen, states[:-1])
                target_tot = jax.lax.stop_gradient(
                    self.mixer.apply(target_params["mixer"], target_qs, states[1:])
                )
            if self.standardise_returns:
                target_tot = target_tot * jnp.sqrt(ret_rms.var[0]) + ret_rms.mean[0]
            returns = rewards + gamma * target_tot * (1.0 - dones)
            if self.standardise_returns:
                ret_rms = ret_rms.update(returns.reshape(-1, 1))
                returns = (returns - ret_rms.mean[0]) / jnp.sqrt(ret_rms.var[0])
            loss_tb = (chosen_tot - jax.lax.stop_gradient(returns)) ** 2

        loss = jnp.sum(loss_tb * filled) / jnp.maximum(jnp.sum(filled), 1.0)
        return loss, ret_rms


def build_train_functions(
    env: Environment,
    eval_env: Environment,
    cfg,
    time_limit: int,
    mesh=None,
    dynamic_hypers: tuple = (),
    debug: bool = False,
):
    """Construct (init_state, train_chunk(state, iters), evaluate(state, key)).

    cfg is the `algorithm` config node. Exposed separately from `main` for
    tests and benchmarking. With a `mesh`, the env batch and replay buffer
    shard over the mesh's data axis and XLA inserts the psum gradient sync
    (see `codebase_tpu/parallel/mesh.py`).

    `debug` checkifies the train chunk (NaN/OOB/div checks raised with op
    location, `utils/debug.py`) and replaces the pre-`training_start` NaN
    loss sentinel with 0.0 so the NaN checks stay meaningful — debug-mode
    results.csv rows before training starts therefore log loss 0.0.

    `dynamic_hypers` names scalar hyperparameters (subset of "lr", "gamma",
    "tau") to read from the train state instead of baking into the program —
    `init_state(key, hyper={...})` then sets per-instance values, and one
    compiled program trains a whole vmapped (hyperparam x seed) grid
    (SURVEY.md §2 "vmap over seed/hyperparam axes"; `sweep.py`). The tau
    regime (hard >1 vs Polyak <1) stays static from the config default, so
    swept tau values must live on the same side of 1.0.
    """
    acfg = cfg
    dynamic_hypers = tuple(dynamic_hypers)
    assert set(dynamic_hypers) <= {"lr", "gamma", "tau"}, dynamic_hypers
    env_sharding = None
    if mesh is not None:
        from codebase_tpu.parallel.mesh import env_axis_sharding

        env_sharding = env_axis_sharding(mesh)
    model = DQNModel.create(env, acfg.model, acfg)
    reward_plan = standardisation_plan(env)
    n_envs = int(acfg.get("parallel_envs", 1))
    batch_size = int(acfg.batch_size)
    # round the episode capacity up to a multiple of the insert width so ring
    # inserts stay a single contiguous slice (see `ops/replay.py::replay_add`)
    buffer_size = -(-int(acfg.buffer_size) // n_envs) * n_envs
    updates_per_collect = acfg.get("updates_per_collect", "auto")
    n_updates = n_envs if updates_per_collect == "auto" else int(updates_per_collect)
    # rollout collector variant: "auto" (while_loop early exit at E>=512,
    # scan below — envs/vector.py), or force "on"/"off" for A/B measurement
    # (the round-5 flagship arbitration; both variants are bit-identical)
    early_exit = early_exit_option(acfg)
    tau = float(acfg.target_update_interval_or_tau)
    # reference clip scope: clip_grad_norm_ touches ONLY critic.parameters()
    # (`dqn/model.py:170`) — the QMIX mixer trains through the same Adam but
    # its gradients are never clipped nor counted in the norm. Whole-tree
    # clipping measurably changes QMIX learning dynamics (round-4 gate).
    clip_mask = (
        {"critic": True, "mixer": False} if model.mixer is not None else None
    )
    opt = make_optimizer(
        acfg.optimizer,
        float(acfg.lr),
        acfg.grad_clip,
        inject_lr="lr" in dynamic_hypers,
        clip_mask=clip_mask,
    )
    hyper_defaults = {
        "lr": float(acfg.lr),
        "gamma": float(acfg.gamma),
        "tau": tau,
    }
    eps_sched = epsilon_schedule(
        acfg.eps_decay_style,
        float(acfg.eps_decay_over),
        float(acfg.eps_start),
        float(acfg.eps_end),
        float(acfg.eps_exp_decay_rate),
        int(acfg.total_steps),
    )

    def _hyper_tree(hyper):
        """Normalise a {name: value} dict to jnp scalars for every dynamic
        hyperparameter (missing names take the config default)."""
        if not dynamic_hypers:
            return None
        hyper = hyper or {}
        return {
            k: jnp.asarray(hyper.get(k, hyper_defaults[k]), jnp.float32)
            for k in dynamic_hypers
        }

    @jax.jit
    def _init_state(key, hyper=None) -> DQNTrainState:
        k_model, k_loop = jax.random.split(key)
        params = model.init_params(k_model)
        opt_state = opt.init(params)
        if hyper is not None and "lr" in dynamic_hypers:
            # inject_hyperparams stores the lr in the optimizer state
            opt_state = opt_state._replace(
                hyperparams={**opt_state.hyperparams, "learning_rate": hyper["lr"]}
            )
        return DQNTrainState(
            params=params,
            target_params=jax.tree.map(jnp.copy, params),
            opt_state=opt_state,
            buffer=replay_init(
                buffer_size,
                time_limit,
                env.n_agents,
                env.obs_dim,
                env.n_actions,
                with_mask=env.has_action_mask,
                # bf16 replay is lossless only for integer-valued obs (grid
                # coords/levels/one-hots); envs with fractional features
                # (e.g. SMAClite hp ratios) default to exact f32 storage
                obs_dtype=jnp.dtype(
                    str(
                        acfg.get(
                            "replay_obs_dtype",
                            "bfloat16" if env.integer_valued_obs else "float32",
                        )
                    )
                ),
            ),
            ret_rms=model.init_rms(),
            key=k_loop,
            env_steps=jnp.asarray(0, jnp.int32),
            updates=jnp.asarray(0, jnp.int32),
            last_target_update=jnp.asarray(0, jnp.int32),
            reward_stream=(
                RewardStream.init(n_envs, env.n_agents) if reward_plan else None
            ),
            hyper=_hyper_tree(hyper),
        )

    def init_state(key, hyper=None) -> DQNTrainState:
        if mesh is None:
            return _init_state(key, hyper)
        # materialise the state directly at its target shardings: jit with
        # out_shardings creates global arrays, which is the only valid
        # construction in multi-process mode (device_put cannot reshard
        # across processes) and skips a copy in single-process mode
        from codebase_tpu.parallel.mesh import dqn_state_shardings

        shapes = jax.eval_shape(_init_state, key, hyper)
        return jax.jit(_init_state, out_shardings=dqn_state_shardings(shapes, mesh))(
            key, hyper
        )

    def make_update_step(hyper):
        """One gradient update on a pre-gathered batch; the traced
        hyperparameters are closed over so the scan carry stays small. The
        batch arrives as scan xs (gathered once for all updates by
        `replay_sample_many` — per-update random gathers serialise into
        row DMAs on TPU and dominated the QMIX update cost)."""
        hyper = hyper or {}
        gamma_val = hyper.get("gamma")  # None -> model.loss uses its static gamma
        tau_val = hyper.get("tau", tau)

        def update_step(carry, batch):
            params, target_params, opt_state, ret_rms, updates, last_tgt = carry
            batch = batch_to_reference_layout(batch)
            (loss, ret_rms), grads = jax.value_and_grad(model.loss, has_aux=True)(
                params, target_params, batch, ret_rms, gamma_val
            )
            upd, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, upd)
            updates = updates + 1
            # target maintenance (`dqn/model.py:176-196`); the hard-vs-Polyak
            # regime is static from the config default even when tau is swept
            if tau > 1.0:
                do_hard = (updates - last_tgt) >= tau_val
                target_params = tree_where(do_hard, params, target_params)
                last_tgt = jnp.where(do_hard, updates, last_tgt)
            elif tau < 1.0:
                target_params = soft_update(target_params, params, tau_val)
            return (params, target_params, opt_state, ret_rms, updates, last_tgt), loss

        return update_step

    def train_iteration(state: DQNTrainState, _):
        key, k_roll, k_upd = jax.random.split(state.key, 3)
        epsilon = eps_sched(state.env_steps)
        rollout, _ = collect_episodes(
            env,
            model.policy(state.params, epsilon),
            model.critic.init_hiddens(n_envs),
            k_roll,
            n_envs,
            time_limit,
            bool(acfg.use_proper_termination),
            env_sharding=env_sharding,
            early_exit=early_exit,
        )
        reward_stream = state.reward_stream
        if reward_plan is not None:
            # persistent streaming standardisation of the raw rewards
            # (reference wrapper lifetime semantics, `utils/wrappers.py:111`)
            reward_stream, std_rewards = apply_plan(
                reward_plan, reward_stream, rollout.stat_rewards, rollout.filled
            )
            rollout = rollout.replace(rewards=std_rewards)
        buffer = replay_add(
            state.buffer, rollout, str(acfg.get("replay_slot_reuse", "reference"))
        )
        env_steps = state.env_steps + rollout.env_steps.astype(jnp.int32)

        can_update = (env_steps > int(acfg.training_start)) & buffer.can_sample(batch_size)

        def do_updates(operand):
            # ONE gather for all updates (None mask leaves scan through as None)
            batches = replay_sample_many(buffer, k_upd, batch_size, n_updates)
            carry, losses = jax.lax.scan(
                make_update_step(state.hyper), operand, batches
            )
            return carry + (jnp.mean(losses),)

        def no_updates(operand):
            # NaN marks "no update happened" for the logger's nanmean; debug
            # mode swaps it for 0.0 so checkify/debug_nans don't flag it
            return operand + (jnp.float32(0.0 if debug else jnp.nan),)

        operand = (
            state.params,
            state.target_params,
            state.opt_state,
            state.ret_rms,
            state.updates,
            state.last_target_update,
        )
        params, tparams, opt_state, rms, updates, last, loss = jax.lax.cond(
            can_update, do_updates, no_updates, operand
        )

        new_state = DQNTrainState(
            params=params,
            target_params=tparams,
            opt_state=opt_state,
            buffer=buffer,
            ret_rms=rms,
            key=key,
            env_steps=env_steps,
            updates=updates,
            last_target_update=last,
            reward_stream=reward_stream,
            hyper=state.hyper,
        )
        metrics = {
            "loss": loss,
            "epsilon": epsilon,
            "episode_returns": rollout.episode_returns,  # (E, N)
            "episode_lengths": rollout.episode_lengths,  # (E,)
        }
        return new_state, metrics

    @partial(jax.jit, static_argnames=("iters",))
    def train_chunk(state: DQNTrainState, iters: int):
        return jax.lax.scan(train_iteration, state, None, length=iters)

    if debug:
        from codebase_tpu.utils.debug import checkify_chunk

        train_chunk = checkify_chunk(train_chunk)

    @jax.jit
    def evaluate(params, key):
        """Greedy (eps_evaluation) rollouts on the eval env — replaces the
        100-episode python eval loop (`dqn/train.py:177-199`)."""
        rollout, _ = collect_episodes(
            eval_env,
            model.policy(params, float(acfg.eps_evaluation)),
            model.critic.init_hiddens(int(acfg.eval_episodes)),
            key,
            int(acfg.eval_episodes),
            time_limit,
        )
        return {
            "episode_returns": rollout.episode_returns,  # (E, N)
            "episode_lengths": rollout.episode_lengths,
        }

    return model, init_state, train_chunk, evaluate
