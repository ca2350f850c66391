"""On-policy actor-critic family: IA2C, MAA2C, IPPO, MAPPO — fused on-device.

Reference: `marlbase/ac/` — `A2CNetwork`/`PPONetwork` (`ac/model.py`) driven
by an AsyncVectorEnv collection loop (`ac/train.py:24-119`). Here a jitted
iteration collects one padded episode per parallel env (`lax.scan` + vmapped
envs) and applies the update in the same program.

Semantics are exact translations:
- n-step advantage actor-critic loss with entropy bonus and value loss,
  `filled`-masked means (`ac/model.py:189-246`);
- bootstrap values from a *target* critic over all T+1 states
  (`ac/model.py:190-193`);
- optional centralised critic fed the concat of all agent obs — the only
  difference between IA2C/IPPO and MAA2C/MAPPO
  (`ac/model.py:62-64,155-157`; `configs/algorithm/maa2c.yaml:18`);
- PPO: frozen pre-update log-probs, `num_epochs` clipped-surrogate epochs
  over the same batch (`ac/model.py:265-352`);
- target-critic refresh when `step % interval == 0` with the pre-increment
  env-step counter (`ac/model.py:233-239`, called at `ac/train.py:181`
  before `step += t * parallel_envs`), or Polyak tau when < 1;
- environment steps advance by t_max * parallel_envs, where t_max is the
  longest episode in the batch — the reference steps every env until the
  last one finishes (`ac/train.py:71,204`).
"""

from __future__ import annotations

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
from codebase_tpu.envs.vector import Rollout, collect_episodes
from codebase_tpu.models import distributions as D
from codebase_tpu.envs.wrappers import standardisation_plan
from codebase_tpu.models.multi_agent import MultiAgentNetwork
from codebase_tpu.ops.returns import nstep_returns
from codebase_tpu.ops.reward_stream import RewardStream, apply_plan
from codebase_tpu.ops.running_stats import RunningMeanStd


@struct.dataclass
class ACTrainState:
    params: Any  # {"actor": ..., "critic": ...}
    target_critic: Any
    opt_state: Any
    ret_rms: RunningMeanStd
    key: jnp.ndarray
    env_steps: jnp.ndarray  # () int32
    updates: jnp.ndarray  # () int32
    # persistent per-env reward-standardisation moments (None unless the env
    # stack contains a StandardiseReward marker; see ops/reward_stream.py)
    reward_stream: Optional[RewardStream] = None
    # traced scalar hyperparameters for vmapped sweeps (see algos/dqn.py)
    hyper: Optional[Any] = None


@dataclass(frozen=True)
class ACModel:
    actor: MultiAgentNetwork
    critic: MultiAgentNetwork
    centralised_critic: bool
    ppo: bool
    gamma: float
    n_steps: int
    entropy_coef: float
    value_loss_coef: float
    standardise_returns: bool
    num_epochs: int
    ppo_clip: float
    use_action_masks: bool

    @staticmethod
    def create(env: Environment, model_cfg, algo_cfg) -> "ACModel":
        ppo = model_cfg.get("name", "a2c") == "ppo"
        a = model_cfg.actor
        c = model_cfg.critic
        actor = MultiAgentNetwork.create(
            input_sizes=env.obs_dims,
            hidden_dims=tuple(a.layers),
            output_sizes=env.action_dims,
            parameter_sharing=a.parameter_sharing,
            use_rnn=a.use_rnn,
            use_orthogonal_init=a.use_orthogonal_init,
            compute_dtype=str(a.get("dtype", "float32")),
            fused_rnn=str(a.get("fused_rnn", "auto")),
        )
        centralised = bool(c.centralised)
        critic_inputs = (
            [sum(env.obs_dims)] * env.n_agents if centralised else list(env.obs_dims)
        )
        critic = MultiAgentNetwork.create(
            input_sizes=critic_inputs,
            hidden_dims=tuple(c.layers),
            output_sizes=[1] * env.n_agents,
            parameter_sharing=c.parameter_sharing,
            use_rnn=c.use_rnn,
            use_orthogonal_init=c.use_orthogonal_init,
            compute_dtype=str(c.get("dtype", "float32")),
            fused_rnn=str(c.get("fused_rnn", "auto")),
        )
        return ACModel(
            actor=actor,
            critic=critic,
            centralised_critic=centralised,
            ppo=ppo,
            gamma=float(algo_cfg.gamma),
            n_steps=int(algo_cfg.n_steps),
            entropy_coef=float(algo_cfg.entropy_coef),
            value_loss_coef=float(algo_cfg.value_loss_coef),
            standardise_returns=bool(algo_cfg.standardise_returns),
            num_epochs=int(algo_cfg.get("num_epochs", 1)) if ppo else 1,
            ppo_clip=float(algo_cfg.get("ppo_clip", 0.2)),
            use_action_masks=env.has_action_mask,
        )

    @property
    def n_agents(self):
        return self.actor.n_agents

    def init_params(self, key):
        k_a, k_c = jax.random.split(key)
        return {"actor": self.actor.init(k_a), "critic": self.critic.init(k_c)}

    def init_rms(self):
        return RunningMeanStd.init((self.n_agents,))

    # ---------------------------------------------------------------- acting

    def policy(self, actor_params):
        """Sampling rollout policy (`ac/model.py:147-153`)."""

        def act(carry, obs, mask, key):
            x = jnp.moveaxis(obs, 1, 0)[:, None]  # (N, 1, E, D)
            logits, carry = self.actor.apply(actor_params, x, carry)
            logits = logits[:, 0]  # (N, E, A)
            if self.use_action_masks:
                logits = D.apply_mask(logits, jnp.moveaxis(mask, 1, 0))
            actions = D.sample(key, logits)  # (N, E)
            return carry, jnp.moveaxis(actions, 0, 1).astype(jnp.int32)

        return act

    # ------------------------------------------------------------- forwards

    def _critic_inputs(self, obs_agents):
        """obs_agents: (N, T, B, D) -> critic inputs, centralised = concat of
        all agents' obs fed to every agent's critic (`ac/model.py:155-157`)."""
        if not self.centralised_critic:
            return obs_agents
        N = obs_agents.shape[0]
        joint = jnp.concatenate([obs_agents[i] for i in range(N)], axis=-1)
        return jnp.broadcast_to(joint[None], (N,) + joint.shape)

    def values(self, critic_params, obs_agents):
        """(N, T, B, D) obs -> (T, B, N) state values."""
        v, _ = self.critic.apply(critic_params, self._critic_inputs(obs_agents))
        return jnp.moveaxis(v[..., 0], 0, -1)

    def log_probs_entropy(self, actor_params, obs_agents, actions, amask):
        """-> (log_probs (T, B, N), entropy (T, B) summed over agents)."""
        logits, _ = self.actor.apply(actor_params, obs_agents)  # (N, T, B, A)
        if self.use_action_masks:
            logits = D.apply_mask(logits, amask)
        lp = D.log_prob(logits, jnp.moveaxis(actions, -1, 0))  # (N, T, B)
        ent = jnp.sum(D.entropy(logits), axis=0)  # (T, B)
        return jnp.moveaxis(lp, 0, -1), ent

    # ----------------------------------------------------------------- loss

    def compute_returns(self, target_critic, rollout_obs, rewards, dones, ret_rms, gamma=None):
        """n-step returns from target-critic bootstraps
        (`ac/model.py:190-204`). rollout_obs (N, T+1, B, D); rewards (T, B, N);
        dones (T+1, B). Returns ((T, B, N) returns, updated rms). `gamma`
        optionally overrides the static discount with a traced scalar
        (vmapped hyperparameter sweeps)."""
        gamma = self.gamma if gamma is None else gamma
        next_value = self.values(target_critic, rollout_obs)  # (T+1, B, N)
        if self.standardise_returns:
            next_value = ret_rms.denormalise(next_value)
        done_n = jnp.repeat(dones[..., None], self.n_agents, axis=-1)
        returns = nstep_returns(rewards, done_n, next_value, self.n_steps, gamma)
        if self.standardise_returns:
            ret_rms = ret_rms.update(returns)
            returns = ret_rms.normalise(returns)
        return returns, ret_rms

    def a2c_loss(self, params, returns, obs_in, actions, amask_in, filled):
        """(`ac/model.py:206-231`). Returns (loss, metrics dict)."""
        values = self.values(params["critic"], obs_in)  # (T, B, N)
        log_probs, entropy = self.log_probs_entropy(params["actor"], obs_in, actions, amask_in)
        advantage = returns - values
        fsum = jnp.maximum(jnp.sum(filled), 1.0)
        actor_loss = (
            -jnp.sum(log_probs * jax.lax.stop_gradient(advantage), axis=-1)
            - self.entropy_coef * entropy
        )
        actor_loss = jnp.sum(actor_loss * filled) / fsum
        value_loss = jnp.sum(jnp.sum(advantage**2, axis=-1) * filled) / fsum
        loss = actor_loss + self.value_loss_coef * value_loss
        metrics = {
            "loss": loss,
            "actor_loss": actor_loss,
            "value_loss": value_loss,
            "entropy": jnp.sum(entropy * filled) / fsum,
        }
        return loss, metrics

    def ppo_loss(self, params, returns, old_log_probs, obs_in, actions, amask_in, filled):
        """Clipped surrogate epoch loss (`ac/model.py:297-334`)."""
        values = self.values(params["critic"], obs_in)
        log_probs, entropy = self.log_probs_entropy(params["actor"], obs_in, actions, amask_in)
        advantage = returns - values
        adv_sg = jax.lax.stop_gradient(advantage)
        ratio = jnp.exp(log_probs - old_log_probs)
        surr1 = ratio * adv_sg
        surr2 = jnp.clip(ratio, 1.0 - self.ppo_clip, 1.0 + self.ppo_clip) * adv_sg
        fsum = jnp.maximum(jnp.sum(filled), 1.0)
        actor_loss = -jnp.sum(jnp.minimum(surr1, surr2), axis=-1) - self.entropy_coef * entropy
        actor_loss = jnp.sum(actor_loss * filled) / fsum
        value_loss = jnp.sum(jnp.sum(advantage**2, axis=-1) * filled) / fsum
        loss = actor_loss + self.value_loss_coef * value_loss
        metrics = {
            "loss": loss,
            "actor_loss": actor_loss,
            "value_loss": value_loss,
            "entropy": jnp.sum(entropy * filled) / fsum,
        }
        return loss, metrics


def build_train_functions(
    env: Environment,
    eval_env: Environment,
    cfg,
    time_limit: int,
    mesh=None,
    dynamic_hypers: tuple = (),
    debug: bool = False,
):
    """Construct (model, init_state, train_chunk, evaluate). `debug`
    checkifies the train chunk: NaN/OOB/div errors raise with op location
    (`utils/debug.py`). With a `mesh`,
    the env batch axis of rollouts shards over the data axis; params stay
    replicated and XLA reduces gradients with psum collectives.

    `dynamic_hypers` lifts scalar hyperparameters ("lr", "gamma", "tau")
    into the train state for vmapped sweeps — see `algos/dqn.py` for the
    mechanism and `sweep.py` for the driver."""
    acfg = cfg
    dynamic_hypers = tuple(dynamic_hypers)
    assert set(dynamic_hypers) <= {"lr", "gamma", "tau"}, dynamic_hypers
    env_sharding = None
    if mesh is not None:
        from codebase_tpu.parallel.mesh import env_axis_sharding

        env_sharding = env_axis_sharding(mesh)
    model = ACModel.create(env, acfg.model, acfg)
    reward_plan = standardisation_plan(env)
    n_envs = int(acfg.get("parallel_envs", 1))
    tau = float(acfg.target_update_interval_or_tau)
    opt = make_optimizer(
        acfg.optimizer, float(acfg.lr), acfg.grad_clip, inject_lr="lr" in dynamic_hypers
    )
    early_exit = early_exit_option(acfg)
    hyper_defaults = {"lr": float(acfg.lr), "gamma": float(acfg.gamma), "tau": tau}

    def _hyper_tree(hyper):
        if not dynamic_hypers:
            return None
        hyper = hyper or {}
        return {
            k: jnp.asarray(hyper.get(k, hyper_defaults[k]), jnp.float32)
            for k in dynamic_hypers
        }

    @jax.jit
    def _init_state(key, hyper=None) -> ACTrainState:
        k_model, k_loop = jax.random.split(key)
        params = model.init_params(k_model)
        opt_state = opt.init(params)
        if hyper is not None and "lr" in dynamic_hypers:
            opt_state = opt_state._replace(
                hyperparams={**opt_state.hyperparams, "learning_rate": hyper["lr"]}
            )
        return ACTrainState(
            params=params,
            target_critic=jax.tree.map(jnp.copy, params["critic"]),
            opt_state=opt_state,
            ret_rms=model.init_rms(),
            key=k_loop,
            env_steps=jnp.asarray(0, jnp.int32),
            updates=jnp.asarray(0, jnp.int32),
            reward_stream=(
                RewardStream.init(n_envs, env.n_agents) if reward_plan else None
            ),
            hyper=_hyper_tree(hyper),
        )

    def init_state(key, hyper=None) -> ACTrainState:
        if mesh is None:
            return _init_state(key, hyper)
        # jit-with-out_shardings construction (valid in multi-process mode,
        # where device_put cannot reshard across processes)
        from codebase_tpu.parallel.mesh import ac_state_shardings

        shapes = jax.eval_shape(_init_state, key, hyper)
        return jax.jit(_init_state, out_shardings=ac_state_shardings(shapes, mesh))(
            key, hyper
        )

    def update(state: ACTrainState, rollout: Rollout, k_upd):
        hyper = state.hyper or {}
        gamma_val = hyper.get("gamma")  # None -> static model gamma
        tau_val = hyper.get("tau", tau)
        # (T+1, E, N, D) -> (N, T+1, E, D)
        obs_agents = jnp.moveaxis(rollout.obs, 2, 0)
        amask_all = jnp.moveaxis(rollout.action_mask, 2, 0)  # (N, T+1, E, A)
        returns, ret_rms = model.compute_returns(
            state.target_critic,
            obs_agents,
            rollout.rewards,
            rollout.dones,
            state.ret_rms,
            gamma_val,
        )
        returns = jax.lax.stop_gradient(returns)
        obs_in = obs_agents[:, :-1]
        amask_in = amask_all[:, :-1]

        if not model.ppo:
            (loss, metrics), grads = jax.value_and_grad(model.a2c_loss, has_aux=True)(
                state.params, returns, obs_in, rollout.actions, amask_in, rollout.filled
            )
            upd, opt_state = opt.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, upd)
        else:
            old_lp, _ = model.log_probs_entropy(
                state.params["actor"], obs_in, rollout.actions, amask_in
            )
            old_lp = jax.lax.stop_gradient(old_lp)

            def epoch(carry, _):
                params, opt_state = carry
                (loss, metrics), grads = jax.value_and_grad(model.ppo_loss, has_aux=True)(
                    params, returns, old_lp, obs_in, rollout.actions, amask_in, rollout.filled
                )
                upd, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, upd)
                return (params, opt_state), metrics

            (params, opt_state), epoch_metrics = jax.lax.scan(
                epoch, (state.params, state.opt_state), None, length=model.num_epochs
            )
            metrics = jax.tree.map(jnp.mean, epoch_metrics)

        # target critic refresh with the PRE-increment step counter
        # (`ac/model.py:233-239`)
        target_critic = state.target_critic
        if tau > 1.0:
            do_hard = (state.env_steps % tau_val.astype(jnp.int32)) == 0 if (
                "tau" in dynamic_hypers
            ) else (state.env_steps % jnp.int32(tau)) == 0
            target_critic = tree_where(do_hard, params["critic"], target_critic)
        elif tau < 1.0:
            target_critic = soft_update(target_critic, params["critic"], tau_val)

        return state.replace(
            params=params,
            target_critic=target_critic,
            opt_state=opt_state,
            ret_rms=ret_rms,
            updates=state.updates + 1,
        ), metrics

    def train_iteration(state: ACTrainState, _):
        key, k_roll, k_upd = jax.random.split(state.key, 3)
        rollout, _ = collect_episodes(
            env,
            model.policy(state.params["actor"]),
            model.actor.init_hiddens(n_envs),
            k_roll,
            n_envs,
            time_limit,
            bool(acfg.use_proper_termination),
            env_sharding=env_sharding,
            early_exit=early_exit,
        )
        if reward_plan is not None:
            # persistent streaming standardisation of the raw rewards
            # (reference wrapper lifetime semantics, `utils/wrappers.py:111`)
            stream, std_rewards = apply_plan(
                reward_plan, state.reward_stream, rollout.stat_rewards, rollout.filled
            )
            rollout = rollout.replace(rewards=std_rewards)
            state = state.replace(reward_stream=stream)
        state, metrics = update(state.replace(key=key), rollout, k_upd)
        # step accounting: t_max * parallel_envs (`ac/train.py:204`)
        t_max = jnp.max(rollout.episode_lengths).astype(jnp.int32)
        state = state.replace(env_steps=state.env_steps + t_max * n_envs)
        metrics = dict(
            metrics,
            episode_returns=rollout.episode_returns,
            episode_lengths=rollout.episode_lengths,
        )
        return state, metrics

    @partial(jax.jit, static_argnames=("iters",))
    def train_chunk(state: ACTrainState, iters: int):
        return jax.lax.scan(train_iteration, state, None, length=iters)

    if debug:
        from codebase_tpu.utils.debug import checkify_chunk

        train_chunk = checkify_chunk(train_chunk)

    @jax.jit
    def evaluate(params, key):
        """Sampling-policy rollouts on the eval env. The reference has no
        separate AC eval (it logs training episodes); this exists for the
        eval CLI and videos."""
        rollout, _ = collect_episodes(
            eval_env,
            model.policy(params["actor"]),
            model.actor.init_hiddens(int(acfg.eval_episodes)),
            key,
            int(acfg.eval_episodes),
            time_limit,
        )
        return {
            "episode_returns": rollout.episode_returns,
            "episode_lengths": rollout.episode_lengths,
        }

    return model, init_state, train_chunk, evaluate
