"""SMAClite rollout cost ablation (round 4): where do the 37ms go?

Times collect_episodes variants on the qmix_smaclite_3m bench shapes:
  net_f32     — the real epsilon-greedy policy, f32 compute (the lane today)
  net_bf16    — same net, bfloat16 matmul compute
  random      — mask-categorical random actions, no network (env-only floor)

Usage: python scripts/diag/smaclite_rollout_ablate.py [--envs 16384] [--T 60]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp

from codebase_tpu.envs.factory import make_env
from codebase_tpu.envs.vector import collect_episodes
from codebase_tpu.models.multi_agent import MultiAgentNetwork
from codebase_tpu.utils.compilation_cache import enable as enable_cache


def time_rollout(env, policy, carry, n_envs, T, reps=6):
    @jax.jit
    def run(key):
        rollout, _ = collect_episodes(env, policy, carry, key, n_envs, T)
        return rollout.env_steps, rollout.episode_lengths

    steps, _ = run(jax.random.PRNGKey(0))
    steps = float(jax.device_get(steps))  # sync (axon-reliable)
    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        out = run(jax.random.PRNGKey(r))
        jax.device_get(out[0])
        best = min(best, time.perf_counter() - t0)
    return best, steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=16384)
    ap.add_argument("--T", type=int, default=60)
    args = ap.parse_args()
    enable_cache()

    env = make_env("smaclite:3m-v0", time_limit=args.T)

    def random_policy(carry, obs, mask, key):
        a = jax.random.categorical(
            key, jnp.where(mask > 0, 0.0, -jnp.inf), axis=-1
        )
        return carry, a.astype(jnp.int32)

    results = {"envs": args.envs, "T": args.T}
    t, steps = time_rollout(env, random_policy, None, args.envs, args.T)
    results["random_ms"] = round(t * 1e3, 2)
    results["steps_per_rollout"] = steps

    from codebase_tpu.algos.dqn import DQNModel

    class _Cfg(dict):
        __getattr__ = dict.__getitem__

        def get(self, k, d=None):
            return super().get(k, d)

    for dtype in ("float32", "bfloat16"):
        critic = MultiAgentNetwork.create(
            input_sizes=env.obs_dims,
            hidden_dims=(128, 128),
            output_sizes=env.action_dims,
            parameter_sharing=False,
            use_rnn=False,
            use_orthogonal_init=True,
            compute_dtype=dtype,
        )
        params = critic.init(jax.random.PRNGKey(0))
        model = DQNModel(
            critic=critic, mixer=None, mixer_type="none", gamma=0.99,
            double_q=True, standardise_returns=False, use_action_masks=True,
        )
        pol = model.policy({"critic": params}, 0.5)
        t, _ = time_rollout(env, pol, critic.init_hiddens(args.envs), args.envs, args.T)
        results[f"net_{dtype}_ms"] = round(t * 1e3, 2)

    results["env_steps_per_s_net_f32"] = round(
        steps / (results["net_float32_ms"] / 1e3), 1
    )
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
