"""Repeated matrix games — tiny cooperative envs for exact tests.

Not part of the reference's env zoo (it wraps lbforaging/rware/smaclite,
README.md:71-74), but invaluable as a deterministic test substrate for the
algorithm families: known optimal joint actions, one-step episodes, constant
observations.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

import numpy as np
import jax.numpy as jnp
from flax import struct

from codebase_tpu.envs.api import Environment, TimeStep


@struct.dataclass
class MatrixState:
    t: jnp.ndarray  # () int32


PAYOFF_MATRICES = {
    # independent learners can solve this one greedily
    "coordination": ((1.0, 0.0), (0.0, 0.5)),
    # the classic climbing game (hard for independent learners)
    "climbing": ((11.0, -30.0, 0.0), (-30.0, 7.0, 0.0), (0.0, 0.0, 5.0)),
    "penalty": ((10.0, 0.0, -10.0), (0.0, 2.0, 0.0), (-10.0, 0.0, 10.0)),
}


@dataclass(frozen=True)
class MatrixGame(Environment):
    """Two-player repeated matrix game with shared reward."""

    payoffs: Tuple[Tuple[float, ...], ...] = PAYOFF_MATRICES["coordination"]
    episode_length: int = 1

    @property
    def n_agents(self) -> int:
        return 2

    @property
    def obs_dim(self) -> int:
        return 1

    @property
    def n_actions(self) -> int:
        return len(self.payoffs)

    @property
    def integer_valued_obs(self) -> bool:
        return True  # constant observation

    def _obs(self):
        return jnp.ones((2, 1), jnp.float32)

    def reset(self, key):
        del key
        zeros = jnp.zeros((2,), jnp.float32)
        ts = TimeStep(
            obs=self._obs(),
            reward=zeros,
            stat_reward=zeros,
            terminated=jnp.asarray(False),
            truncated=jnp.asarray(False),
            action_mask=self.full_ones_mask(),
        )
        return MatrixState(t=jnp.asarray(0, jnp.int32)), ts

    def step(self, state, actions, key):
        del key
        table = jnp.asarray(np.array(self.payoffs, np.float32))
        r = table[actions[0], actions[1]]
        reward = jnp.full((2,), r, jnp.float32)
        t = state.t + 1
        ts = TimeStep(
            obs=self._obs(),
            reward=reward,
            stat_reward=reward,
            terminated=t >= self.episode_length,
            truncated=jnp.asarray(False),
            action_mask=self.full_ones_mask(),
        )
        return MatrixState(t=t), ts


def parse_matrix_name(name: str) -> MatrixGame:
    """`matrix-<game>[-<episode_length>]`, e.g. `matrix-climbing-5`."""
    parts = name.split(":")[-1].split("-")
    assert parts[0] == "matrix"
    game = parts[1] if len(parts) > 1 else "coordination"
    length = int(parts[2]) if len(parts) > 2 else 1
    return MatrixGame(payoffs=PAYOFF_MATRICES[game], episode_length=length)
