"""Persistent streaming reward standardisation.

Reference: `marlbase/utils/wrappers.py:111-141` (`StandardiseReward`) — one
West's-algorithm stream of running reward moments *per env worker process*,
persisting for the lifetime of the env object and updated once per real env
step. Under the functional env API a stateful in-stack wrapper cannot
reproduce that (rollouts re-reset wrapper state and finished envs keep
stepping inside the fixed-T scan), so the stream lives here as an explicit
`RewardStream` pytree carried in the algorithms' TrainState: one stream per
env instance, exactly one update per *filled* step, persisting across
rollouts for the whole run — the reference's lifetime semantics at batch
scale.

`standardisation_plan` (in `envs/wrappers.py`) locates the `StandardiseReward`
marker in a wrapper stack and splits the reward-transforming wrappers into
those below it (feed the stream's input) and above it (re-applied to the
standardised output), preserving the reference's wrapper-order semantics —
e.g. VDN's CooperativeReward sits *above* StandardiseReward in the reference
factory (`utils/envs.py:42-54`), so the team reward is the sum of
standardised per-agent rewards.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RewardStream:
    """West's weighted incremental moments, unit weights, per env × agent."""

    sumw: jnp.ndarray  # (E, N) float32 — total weight == samples seen
    wmean: jnp.ndarray  # (E, N) float32 — running mean
    tvar: jnp.ndarray  # (E, N) float32 — running sum of squared deviations
    n: jnp.ndarray  # (E,) float32 — samples seen (per env instance)

    @staticmethod
    def init(n_envs: int, n_agents: int) -> "RewardStream":
        z = jnp.zeros((n_envs, n_agents), jnp.float32)
        return RewardStream(sumw=z, wmean=z, tvar=z, n=jnp.zeros((n_envs,), jnp.float32))


def stream_update(stream: RewardStream, reward: jnp.ndarray):
    """One streaming update + standardisation over an (E, N) reward batch.

    Exact update of `utils/wrappers.py:119-141`: the very first sample per
    stream passes through raw; afterwards the reward is standardised with the
    *post-update* moments (the reference updates, then normalises).
    """
    q = reward - stream.wmean
    temp_sumw = stream.sumw + 1.0
    r = q / temp_sumw
    wmean = stream.wmean + r
    tvar = stream.tvar + q * r * stream.sumw
    n = stream.n + 1.0
    var = (tvar * n[:, None]) / (temp_sumw * jnp.maximum(n - 1.0, 1e-9)[:, None])
    std = (reward - wmean) / (jnp.sqrt(jnp.maximum(var, 0.0)) + 1e-6)
    out = jnp.where((n <= 1.0)[:, None], reward, std)
    return RewardStream(sumw=temp_sumw, wmean=wmean, tvar=tvar, n=n), out


def standardise_rollout(stream: RewardStream, rewards: jnp.ndarray, filled: jnp.ndarray):
    """Standardise a (T, E, N) reward rollout in time order.

    Only *filled* steps update a stream and produce non-zero output —
    matching the reference, where env workers stop stepping once their
    episode is done. Returns (updated stream, standardised rewards).
    """

    def step(st, x):
        r, f = x  # (E, N), (E,)
        new, out = stream_update(st, r)
        live = (f > 0)[:, None]
        new = RewardStream(
            sumw=jnp.where(live, new.sumw, st.sumw),
            wmean=jnp.where(live, new.wmean, st.wmean),
            tvar=jnp.where(live, new.tvar, st.tvar),
            n=jnp.where(f > 0, new.n, st.n),
        )
        return new, out * f[:, None]

    return jax.lax.scan(step, stream, (rewards, filled))


def apply_plan(plan, stream: RewardStream, stat_rewards: jnp.ndarray, filled: jnp.ndarray):
    """Run a `RewardPlan` over a rollout's raw rewards.

    stat_rewards (T, E, N) are the raw env rewards (recorded below every
    reward-transforming wrapper, see `envs/api.py`); the plan's below-marker
    transforms rebuild the standardiser's exact input, then the above-marker
    transforms (e.g. CooperativeReward's team sum) apply to its output.
    """
    r = stat_rewards
    for fn in plan.below:
        r = fn(r)
    stream, r = standardise_rollout(stream, r, filled)
    for fn in plan.above:
        r = fn(r)
    return stream, r
