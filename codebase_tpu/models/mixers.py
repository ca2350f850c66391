"""Value-decomposition mixers: VDN sum and the QMIX monotonic hypernetwork.

Reference: `marlbase/dqn/model.py:272-331` (`QMixer`): per-(t, b) state, a
hypernetwork generates |w1| >= 0 (n_agents x embed) and |w_final| >= 0
(embed x 1) so Q_tot is monotone in each agent utility; ELU hidden layer and
a state-dependent V(s) bias. The state is the concatenation of all agent
observations (`dqn/model.py:360,389`).

Here the mixer is a pure init/apply pair. The batched torch.bmm over
(T*B, 1, N) collapses into einsums that XLA maps straight onto the MXU.
Linear layers use torch-default init (the reference applies no custom init
to the mixer).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from codebase_tpu.models.networks import linear_init


def _linear(params, x):
    return x @ params["w"] + params["b"]


@dataclass(frozen=True)
class QMixer:
    n_agents: int
    state_dim: int
    embed_dim: int = 64
    hypernet_layers: int = 2
    hypernet_embed: int = 32

    def __post_init__(self):
        if self.hypernet_layers not in (1, 2):
            raise ValueError("hypernet_layers must be 1 or 2 (`dqn/model.py:283-301`)")

    def init(self, key):
        keys = jax.random.split(key, 7)
        S, E, H, N = self.state_dim, self.embed_dim, self.hypernet_embed, self.n_agents
        if self.hypernet_layers == 1:
            hyper_w_1 = [linear_init(keys[0], S, E * N, use_orthogonal=False)]
            hyper_w_final = [linear_init(keys[1], S, E, use_orthogonal=False)]
        else:
            hyper_w_1 = [
                linear_init(keys[0], S, H, use_orthogonal=False),
                linear_init(keys[2], H, E * N, use_orthogonal=False),
            ]
            hyper_w_final = [
                linear_init(keys[1], S, H, use_orthogonal=False),
                linear_init(keys[3], H, E, use_orthogonal=False),
            ]
        return {
            "hyper_w_1": hyper_w_1,
            "hyper_w_final": hyper_w_final,
            "hyper_b_1": linear_init(keys[4], S, E, use_orthogonal=False),
            "v": [
                linear_init(keys[5], S, E, use_orthogonal=False),
                linear_init(keys[6], E, 1, use_orthogonal=False),
            ],
        }

    def _hyper(self, layers, x):
        x = _linear(layers[0], x)
        if len(layers) == 2:
            x = _linear(layers[1], jax.nn.relu(x))
        return x

    def apply(self, params, agent_qs, states):
        """Mix per-agent chosen Qs into Q_tot.

        Args:
            agent_qs: (N, T, B) per-agent chosen action values.
            states: (T, B, S) global state (concat of agent obs).
        Returns:
            (T, B) mixed value.
        """
        N, E = self.n_agents, self.embed_dim
        T, B, S = states.shape
        qs = jnp.moveaxis(agent_qs, 0, -1)  # (T, B, N)

        w1 = jnp.abs(self._hyper(params["hyper_w_1"], states)).reshape(T, B, N, E)
        b1 = _linear(params["hyper_b_1"], states)  # (T, B, E)
        hidden = jax.nn.elu(jnp.einsum("tbn,tbne->tbe", qs, w1) + b1)

        w_final = jnp.abs(self._hyper(params["hyper_w_final"], states))  # (T, B, E)
        v = _linear(params["v"][1], jax.nn.relu(_linear(params["v"][0], states)))  # (T, B, 1)
        y = jnp.einsum("tbe,tbe->tb", hidden, w_final) + v[..., 0]
        return y
