"""Device mesh + sharding rules: the framework's distributed backend.

The reference has NO multi-device or multi-node backend of any kind
(SURVEY.md §2: single process, `torch.set_num_threads(1)`,
`marlbase/run.py:29`; its only parallelism is env subprocesses). This module
is the TPU-native replacement designed from scratch:

- a 1-D `data` mesh over all chips (ICI within a slice; add
  `jax.distributed.initialize` for multi-host pods);
- the environment batch axis is sharded over `data`: each chip simulates
  its own envs (rollout = pure compute, zero communication);
- the episodic replay buffer is sharded over `data` along its slot axis, so
  episode insertion stays chip-local;
- learner parameters and optimizer state are replicated; XLA's GSPMD
  partitioner turns the gradient reduction of the (env-sharded) batch into a
  psum over ICI automatically — the standard "annotate shardings, let XLA
  insert collectives" recipe.

Model parallelism is deliberately absent: the policy networks are two-layer
128-unit MLPs/GRUs (`configs/algorithm/idqn.yaml`), orders of magnitude below
the scale where TP/PP pays for its collectives; data parallelism over
thousands of envs is where this workload's FLOPs are.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first `n_devices` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        assert len(devices) >= n_devices, f"need {n_devices} devices, have {len(devices)}"
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def env_axis_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for arrays whose leading axis is the env batch."""
    return NamedSharding(mesh, P(DATA_AXIS))


def _tree_fill(tree, sharding):
    return jax.tree.map(lambda _: sharding, tree)


def dqn_state_shardings(state, mesh: Mesh):
    """Shardings for a DQNTrainState: replay sharded on the episode-slot
    axis, everything else replicated."""
    rep = replicated(mesh)
    shardings = _tree_fill(state, rep)
    buf = env_axis_sharding(mesh)
    return shardings.replace(
        buffer=state.buffer.replace(
            obs=buf,
            actions=buf,
            rewards=buf,
            dones=buf,
            filled=buf,
            action_mask=buf if state.buffer.action_mask is not None else None,
            pos=rep,
        )
    )


def ac_state_shardings(state, mesh: Mesh):
    """AC state is all-replicated; the env axis only exists transiently
    inside the rollout (constrained there via `collect_episodes`)."""
    return _tree_fill(state, replicated(mesh))
