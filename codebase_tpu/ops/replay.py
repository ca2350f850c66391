"""On-device episodic replay buffer as an immutable pytree.

Reference: `marlbase/dqn/train.py:19-124` — a numpy ring buffer storing whole
padded episodes on the host, sampled into torch tensors per update. Here the
buffer lives in device memory (HBM) as fixed-shape arrays; inserting a batch
of episodes is a scatter (`.at[idx].set`) and sampling is a `random.randint`
gather — both inside the jitted train iteration, so the actor->replay->learner
loop never touches the host.

Layout is episode-major (S slots): obs (S, T+1, N, D), actions/rewards
(S, T, N), dones (S, T+1), filled (S, T), action_mask (S, T+1, N, A). A slot
holds exactly one padded episode (the reference's `max_episode_length` slot,
`dqn/train.py:40-60`); `pos` counts episodes ever added and the write cursor
is `pos % S` (`dqn/train.py:86-89`).

TPU storage notes (both trace-driven):
- obs and action_mask are stored in `obs_dtype` and cast back to float32 at
  sample time. The DQN builder picks bfloat16 when the env declares
  `integer_valued_obs` (grid coords, levels, one-hots — exactly
  representable in bf16, so storage is lossless) and float32 otherwise
  (e.g. SMAClite's fractional hp features); `algorithm.replay_obs_dtype`
  overrides. bf16 halves the buffer's HBM footprint and insert/gather
  traffic and stops XLA from materialising a full-buffer f32->bf16 convert
  each iteration for the loss matmuls (which round inputs to bf16 anyway).
- the mask array is only allocated for envs that actually mask
  (`with_mask`); otherwise the field is None and sampling returns None.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from codebase_tpu.envs.vector import Rollout


@struct.dataclass
class ReplayState:
    obs: jnp.ndarray  # (S, T+1, N, D)
    actions: jnp.ndarray  # (S, T, N) int32
    rewards: jnp.ndarray  # (S, T, N)
    dones: jnp.ndarray  # (S, T+1)
    filled: jnp.ndarray  # (S, T)
    action_mask: Optional[jnp.ndarray]  # (S, T+1, N, A), None for maskless envs
    pos: jnp.ndarray  # () int32 — episodes ever added

    @property
    def size(self) -> int:
        return self.obs.shape[0]

    @property
    def num_stored(self):
        return jnp.minimum(self.pos, self.size)

    def can_sample(self, batch_size: int):
        """`pos >= batch_size` (`dqn/train.py:91-92`)."""
        return self.pos >= batch_size


def replay_init(
    size: int,
    time_limit: int,
    n_agents: int,
    obs_dim: int,
    n_actions: int,
    with_mask: bool = True,
    obs_dtype=jnp.float32,
) -> ReplayState:
    S, T, N, D, A = size, time_limit, n_agents, obs_dim, n_actions
    return ReplayState(
        obs=jnp.zeros((S, T + 1, N, D), obs_dtype),
        actions=jnp.zeros((S, T, N), jnp.int32),
        rewards=jnp.zeros((S, T, N), jnp.float32),
        dones=jnp.zeros((S, T + 1), jnp.float32),
        filled=jnp.zeros((S, T), jnp.float32),
        action_mask=jnp.ones((S, T + 1, N, A), obs_dtype) if with_mask else None,
        pos=jnp.asarray(0, jnp.int32),
    )


def replay_add(
    state: ReplayState, rollout: Rollout, slot_reuse: str = "reference"
) -> ReplayState:
    """Insert E padded episodes (time-major rollout -> episode-major slots).

    When the buffer size is a multiple of E (enforced by the train builders),
    the ring cursor is always block-aligned and the insert is ONE contiguous
    `dynamic_update_slice` — a straight DMA burst. A scatter with E dynamic
    indices would serialise into per-row updates on TPU (orders of magnitude
    slower); the scatter path remains only as a fallback for odd sizes.

    slot_reuse — what happens to a slot's old contents past the new episode's
    end (`t > len`):

    - "reference" (default): KEEP them, `filled` tail included. The
      reference's ring buffer never clears a reused slot — `init_episode`/
      `add` write only the new episode's indices (`dqn/train.py:66-89`) — so
      once the buffer wraps, a short episode carries the stale tail of the
      longer episode that previously occupied its slot, and the loss trains
      on those spliced old transitions (`filled[t]` stays True from the old
      occupant). This measurably changes late-training data distribution
      (episodes shorten as the policy improves) and is required for
      learning-curve parity with the reference (round-3 gate diagnosis:
      exact-update parity proven in f64, remaining deficit isolated to this
      quirk — see BASELINE.md).
    - "clear": zero the tail (the padded rollout overwrites the full slot) —
      the "clean" semantics, selectable via `algorithm.replay_slot_reuse`.
    """
    assert slot_reuse in ("reference", "clear"), slot_reuse
    E = rollout.filled.shape[1]

    def em(x):  # time-major (T, E, ...) -> episode-major (E, T, ...)
        return jnp.moveaxis(x, 1, 0)

    fil = em(rollout.filled)  # (E, T)
    if slot_reuse == "reference":
        # written-index masks per field family: step fields (T) are written
        # exactly where filled; boundary fields (T+1: obs, dones, masks) at
        # index 0 plus one past each filled step
        written_t = fil > 0
        written_t1 = jnp.concatenate(
            [jnp.ones((E, 1), bool), written_t], axis=1
        )  # (E, T+1)
    else:
        written_t = written_t1 = None

    def _written(buf_ndim, val):
        w = written_t if val.shape[1] == fil.shape[1] else written_t1
        return w.reshape(w.shape + (1,) * (buf_ndim - 2))

    if state.size % E == 0:
        start = state.pos % state.size

        def ins(buf, val):
            val = val.astype(buf.dtype)
            idx = (start,) + (jnp.zeros((), jnp.int32),) * (buf.ndim - 1)
            if slot_reuse == "reference":
                old = jax.lax.dynamic_slice(buf, idx, val.shape)
                val = jnp.where(_written(buf.ndim, val), val, old)
            return jax.lax.dynamic_update_slice(buf, val, idx)

    else:
        slots = (state.pos + jnp.arange(E, dtype=jnp.int32)) % state.size

        def ins(buf, val):
            val = val.astype(buf.dtype)
            if slot_reuse == "reference":
                val = jnp.where(_written(buf.ndim, val), val, buf[slots])
            return buf.at[slots].set(val)

    return state.replace(
        obs=ins(state.obs, em(rollout.obs)),
        actions=ins(state.actions, em(rollout.actions)),
        rewards=ins(state.rewards, em(rollout.rewards)),
        dones=ins(state.dones, em(rollout.dones)),
        filled=ins(state.filled, em(rollout.filled)),
        action_mask=(
            ins(state.action_mask, em(rollout.action_mask))
            if state.action_mask is not None
            else None
        ),
        pos=state.pos + E,
    )


def replay_sample(state: ReplayState, key, batch_size: int):
    """Uniform episode sampling (`dqn/train.py:94-124`).

    Returns a dict shaped like the reference `Batch` namedtuple:
    obss (N, T+1, B, D), actions (N, T, B), rewards (N, T, B), dones (T+1, B),
    filled (T, B), action_mask (N, T+1, B, A).
    """
    return batch_to_reference_layout(
        {k: (v[0] if v is not None else None)
         for k, v in replay_sample_many(state, key, batch_size, 1).items()}
    )


def replay_sample_many(state: ReplayState, key, batch_size: int, n: int):
    """Draw `n` independent uniform batches in ONE gather.

    Random episode-slot gathers serialise into per-row DMAs on TPU and
    dominate the update cost when issued per update (round-3 profiling:
    ~2ms of a QMIX update's ~2.1ms was the six per-update gathers). Since
    all updates of one train iteration sample the SAME frozen buffer with
    replacement, one (n*B,)-index gather is distributionally identical to n
    separate (B,) gathers — the scan then consumes pre-gathered batches.

    Leaves keep the gathered slot-major layout with a leading n axis —
    obs (n, B, T+1, N, D), actions (n, B, T, N), dones (n, B, T+1), ... —
    so the (cheap, fused) reference-layout transpose happens per update
    inside the scan (`batch_to_reference_layout`), not as one large 5-D
    transpose of the whole gather (measured slower for small rows).
    """
    idx = jax.random.randint(key, (n * batch_size,), 0, state.num_stored)

    def take(buf):
        g = buf[idx]
        return g.reshape((n, batch_size) + g.shape[1:])

    return dict(
        obss=take(state.obs),
        actions=take(state.actions),
        rewards=take(state.rewards),
        dones=take(state.dones),
        filled=take(state.filled),
        action_mask=(
            take(state.action_mask) if state.action_mask is not None else None
        ),
    )


def batch_to_reference_layout(b: dict) -> dict:
    """One update's slot-major slice -> the reference `Batch` layout:
    obss (N, T+1, B, D), actions (N, T, B), rewards (N, T, B),
    dones (T+1, B), filled (T, B), action_mask (N, T+1, B, A)."""
    return dict(
        obss=jnp.transpose(b["obss"], (2, 1, 0, 3)).astype(jnp.float32),
        actions=jnp.transpose(b["actions"], (2, 1, 0)),
        rewards=jnp.transpose(b["rewards"], (2, 1, 0)),
        dones=jnp.transpose(b["dones"], (1, 0)),
        filled=jnp.transpose(b["filled"], (1, 0)),
        action_mask=(
            jnp.transpose(b["action_mask"], (2, 1, 0, 3)).astype(jnp.float32)
            if b["action_mask"] is not None
            else None
        ),
    )
