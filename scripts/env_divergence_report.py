"""Quantify the documented env divergences vs the original packages.

The originals cannot be installed here (zero egress), so instead of
asserting the three documented divergences are "rare", this script MEASURES
how often the conditions that trigger them actually occur under random
play in the JAX envs. Results go into docs/ENV_PARITY.md; the step-for-step
differential test (tests/test_env_parity.py) runs wherever the originals
are importable.

Divergences measured:
1. RWARE swap/rotation cycles (allowed here, blocked by the original's
   dependency-graph resolution, `codebase_tpu/envs/rware.py:23-28`):
   frequency of steps where agents realize a position-exchange cycle.
2. LBF loader set-pop order dependence (`codebase_tpu/envs/lbforaging.py:
   24-28`): frequency of steps where some LOADing agent is adjacent to >= 2
   active foods — the only configuration where the original's set-pop order
   and this env's fixed N/S/W/E first-choice rule can differ.

Usage:  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python scripts/env_divergence_report.py
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

EPISODES = 512
T = 200


def rware_cycle_frequency():
    from codebase_tpu.envs.rware import FORWARD, parse_rware_name

    env = parse_rware_name("rware-tiny-2ag-v2")
    N = env.n_agents

    def episode(key):
        key, rk = jax.random.split(key)
        state, _ = env.reset(rk)

        def body(carry, _):
            state, key = carry
            key, ak, sk = jax.random.split(key, 3)
            acts = jax.random.randint(ak, (N,), 0, 5)
            prev = state.agent_pos
            state, _ = env.step(state, acts, sk)
            new = state.agent_pos
            # 2-cycle: i moved onto j's old cell and vice versa
            eq = lambda a, b: jnp.all(a == b, axis=-1)
            swap = jnp.zeros((), bool)
            for i in range(N):
                for j in range(i + 1, N):
                    moved = ~eq(prev[i], new[i]) & ~eq(prev[j], new[j])
                    swap = swap | (
                        moved & eq(new[i], prev[j]) & eq(new[j], prev[i])
                    )
            # adjacency attempt: both FORWARD facing each other (upper bound
            # on situations the original would resolve differently)
            return (state, key), swap

        (_, _), swaps = jax.lax.scan(body, (state, key), None, length=T)
        return swaps.sum()

    keys = jax.random.split(jax.random.PRNGKey(0), EPISODES)
    totals = jax.jit(jax.vmap(episode))(keys)
    steps = EPISODES * T
    return int(np.sum(totals)), steps


def lbf_orderdep_frequency():
    from codebase_tpu.envs.lbforaging import LOAD, parse_lbf_name

    env = parse_lbf_name("Foraging-8x8-2p-3f-v3")
    N, F = env.n_agents, env.max_food

    def episode(key):
        key, rk = jax.random.split(key)
        state, _ = env.reset(rk)

        def body(carry, _):
            state, key = carry
            key, ak, sk = jax.random.split(key, 3)
            acts = jax.random.randint(ak, (N,), 0, 6)
            # adjacency BEFORE the step (loading is decided on pre-move state)
            d = jnp.abs(
                state.agent_pos[:, None, :] - state.food_pos[None, :, :]
            ).sum(-1)
            adj = (d == 1) & state.food_active[None, :]  # (N, F)
            multi = (adj.sum(-1) >= 2) & (acts == LOAD)
            ambiguous = multi.any()
            done_before = ~state.food_active.any()
            state, ts = env.step(state, acts, sk)
            return (state, key), (ambiguous & ~done_before)

        (_, _), flags = jax.lax.scan(body, (state, key), None, length=T)
        return flags.sum()

    keys = jax.random.split(jax.random.PRNGKey(1), EPISODES)
    totals = jax.jit(jax.vmap(episode))(keys)
    steps = EPISODES * T
    return int(np.sum(totals)), steps


def main():
    sw, n1 = rware_cycle_frequency()
    amb, n2 = lbf_orderdep_frequency()
    print(
        json.dumps(
            {
                "rware_swap_cycles": sw,
                "rware_steps": n1,
                "rware_rate_per_step": sw / n1,
                "lbf_orderdep_load_steps": amb,
                "lbf_steps": n2,
                "lbf_rate_per_step": amb / n2,
            }
        )
    )


if __name__ == "__main__":
    main()
