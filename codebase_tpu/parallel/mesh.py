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

import logging
import os
from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

log = logging.getLogger("codebase_tpu")

DATA_AXIS = "data"

# env vars whose presence marks a multi-host (pod) launch. Only explicit
# coordinator addresses qualify: TPU runtime vars like TPU_WORKER_HOSTNAMES
# are also set on single-host (and by the axon tunnel plugin), so they are
# not reliable multi-host evidence.
_MULTIHOST_HINTS = (
    "JAX_COORDINATOR_ADDRESS",
    "COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",
)

_distributed_initialized = False


def maybe_initialize_distributed(mode: str = "auto") -> bool:
    """Bring up the JAX multi-host runtime when this process is one worker of
    a pod job.

    `auto` (the default from `configs/default.yaml`) initializes iff a
    multi-host coordinator is advertised in the environment; `always` forces
    it; `never`/False skips. Idempotent. After initialization `jax.devices()`
    spans every host, so the data mesh built by `make_mesh` covers the whole
    slice — gradient psums ride ICI within the slice and DCN across slices.
    """
    global _distributed_initialized
    if mode in (False, None, "never"):
        return False
    if _distributed_initialized:
        return True
    if mode == "auto" and not any(h in os.environ for h in _MULTIHOST_HINTS):
        return False
    # explicit coordinator config (works on any launcher, not just the
    # clusters jax auto-detects): JAX_COORDINATOR_ADDRESS plus
    # JAX_NUM_PROCESSES/JAX_PROCESS_ID identify this worker
    kwargs = {}
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get("COORDINATOR_ADDRESS")
    if addr and "JAX_NUM_PROCESSES" in os.environ and "JAX_PROCESS_ID" in os.environ:
        kwargs = dict(
            coordinator_address=addr,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError) as exc:
        if mode == "auto":
            # incomplete multi-host environment — stay single-process
            log.warning("jax.distributed.initialize skipped: %s", exc)
            return False
        raise
    _distributed_initialized = True
    log.info(
        "jax.distributed initialized: process %d/%d, %d global devices",
        jax.process_index(),
        jax.process_count(),
        len(jax.devices()),
    )
    return True


def is_coordinator() -> bool:
    """True on the process that owns host-side artifacts (results.csv,
    config.yaml, checkpoints, videos). With N hosts, letting every process
    write would race on one results.csv — all filesystem output is gated
    here (`run.py`, `dqn_train.py`, `ac_train.py`)."""
    return jax.process_index() == 0


def fetch_metrics(tree):
    """Bring a metrics pytree to the host.

    Single-process: plain device_get. Multi-process: env-sharded leaves span
    non-addressable devices, so gather them globally first (replicated
    leaves pass through process_allgather tiled — handled by asking for the
    global value per leaf). Every process participates (allgather is a
    collective); only the coordinator should *use* the result.
    """
    if jax.process_count() == 1:
        return jax.device_get(tree)
    from jax.experimental import multihost_utils

    def _leaf(x):
        if getattr(x, "is_fully_addressable", True):
            return jax.device_get(x)
        return multihost_utils.process_allgather(x, tiled=True)

    return jax.tree.map(_leaf, tree)


def sync_flag(local: bool) -> bool:
    """OR-reduce a host-side flag across processes (single-process: identity).

    Used for the preemption flag: SIGTERM may reach only SOME hosts of a pod
    job (e.g. a manual kill on one worker). If the signalled process alone
    took the save-and-exit path, the survivors would enter the next
    train_chunk's collectives without it and the job would deadlock — so the
    drivers agree on the flag at every chunk boundary and every process
    saves/exits together. The allgather is a collective: all processes must
    call this at the same program point.
    """
    if jax.process_count() == 1:
        return bool(local)
    from jax.experimental import multihost_utils

    flags = multihost_utils.process_allgather(np.asarray(bool(local)))
    return bool(np.any(flags))


def assert_agreement(value: int, what: str) -> None:
    """Assert an integer is identical on every process (collective).

    Guards decisions each process makes against its *local* filesystem —
    e.g. `resume=auto` checkpoint discovery: on clusters without a shared
    filesystem, the coordinator could resume from its checkpoint while other
    processes silently start fresh, and `put_global` would then assemble a
    globally inconsistent train state with no error.
    """
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    vals = np.asarray(multihost_utils.process_allgather(np.asarray(int(value))))
    if not np.all(vals == vals.flat[0]):
        raise RuntimeError(
            f"processes disagree on {what}: per-process values {vals.tolist()} "
            f"(process {jax.process_index()} has {int(value)}). On multi-host "
            "deployments every process must see the same checkpoints — use a "
            "shared filesystem or pass an explicit resume path."
        )


def put_global(tree, shardings):
    """Place a host pytree at the given shardings, valid in multi-process
    mode: every process holds the FULL host value (e.g. a loaded checkpoint)
    and contributes only its addressable shards. Single-process this is
    equivalent to `jax.device_put`.
    """

    def _leaf(x, s):
        arr = np.asarray(x)
        return jax.make_array_from_callback(arr.shape, s, lambda idx: arr[idx])

    return jax.tree.map(_leaf, tree, shardings)


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first `n_devices` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        assert len(devices) >= n_devices, f"need {n_devices} devices, have {len(devices)}"
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def mesh_from_config(dist_cfg) -> Optional[Mesh]:
    """Build the data mesh requested by the `distributed` config node.

    `distributed.devices`: null/absent -> no mesh (single default device);
    "all" -> every visible device; int N -> the first N devices.
    `distributed.initialize`: "auto" (default) | "always" | "never" controls
    `jax.distributed.initialize` for multi-host jobs.
    """
    if dist_cfg is None:
        return None
    devices_spec = dist_cfg.get("devices")
    if not devices_spec:
        return None
    maybe_initialize_distributed(dist_cfg.get("initialize", "auto"))
    if str(devices_spec) == "all":
        mesh = make_mesh()
    else:
        mesh = make_mesh(int(devices_spec))
    log.info("data-parallel mesh over %d device(s): %s", mesh.size, mesh)
    return mesh


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def env_axis_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for arrays whose leading axis is the env batch."""
    return NamedSharding(mesh, P(DATA_AXIS))


def _tree_fill(tree, sharding):
    return jax.tree.map(lambda _: sharding, tree)


def dqn_state_shardings(state, mesh: Mesh):
    """Shardings for a DQNTrainState: replay and reward streams sharded on
    their env/episode-slot axis, everything else replicated."""
    rep = replicated(mesh)
    shardings = _tree_fill(state, rep)
    buf = env_axis_sharding(mesh)
    shardings = shardings.replace(
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
    if state.reward_stream is not None:
        shardings = shardings.replace(
            reward_stream=_tree_fill(state.reward_stream, buf)
        )
    return shardings


def ac_state_shardings(state, mesh: Mesh):
    """AC params/optimizer are replicated; the env axis only exists
    transiently inside the rollout (constrained there via
    `collect_episodes`) except for the per-env reward streams, which shard
    like the env batch."""
    shardings = _tree_fill(state, replicated(mesh))
    if state.reward_stream is not None:
        shardings = shardings.replace(
            reward_stream=_tree_fill(state.reward_stream, env_axis_sharding(mesh))
        )
    return shardings
