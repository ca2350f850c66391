"""Streaming mean/variance as an immutable pytree (Chan parallel moments).

Reference: `marlbase/utils/standardise_stream.py:6-43` (RunningMeanStd on
torch tensors, mutated in place). Here the statistics are a pytree carried
through the jitted train step, so return standardisation stays on-device.

Matches the reference numerically, including the unbiased (ddof=1) batch
variance torch.var uses by default (`standardise_stream.py:18`).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RunningMeanStd:
    mean: jnp.ndarray  # (D,)
    var: jnp.ndarray  # (D,)
    count: jnp.ndarray  # () float32

    @staticmethod
    def init(shape, epsilon: float = 1e-4) -> "RunningMeanStd":
        return RunningMeanStd(
            mean=jnp.zeros(shape, jnp.float32),
            var=jnp.ones(shape, jnp.float32),
            count=jnp.asarray(epsilon, jnp.float32),
        )

    def update(self, arr: jnp.ndarray) -> "RunningMeanStd":
        """Merge a batch of samples; arr is reshaped to (-1, D) like
        `standardise_stream.py:16`."""
        arr = arr.reshape(-1, arr.shape[-1]).astype(jnp.float32)
        batch_count = arr.shape[0]
        batch_mean = jnp.mean(arr, axis=0)
        # torch.var is unbiased by default
        batch_var = jnp.var(arr, axis=0, ddof=1) if batch_count > 1 else jnp.zeros_like(batch_mean)
        return self.update_from_moments(batch_mean, batch_var, batch_count)

    def update_from_moments(self, batch_mean, batch_var, batch_count) -> "RunningMeanStd":
        batch_count = jnp.asarray(batch_count, jnp.float32)
        delta = batch_mean - self.mean
        tot_count = self.count + batch_count
        new_mean = self.mean + delta * batch_count / tot_count
        m_a = self.var * self.count
        m_b = batch_var * batch_count
        m_2 = m_a + m_b + jnp.square(delta) * self.count * batch_count / tot_count
        new_var = m_2 / tot_count
        return RunningMeanStd(mean=new_mean, var=new_var, count=tot_count)

    def normalise(self, x: jnp.ndarray) -> jnp.ndarray:
        return (x - self.mean) / jnp.sqrt(self.var)

    def denormalise(self, x: jnp.ndarray) -> jnp.ndarray:
        return x * jnp.sqrt(self.var) + self.mean
