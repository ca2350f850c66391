"""Multi-agent network container: one vmap over stacked per-group params.

Replaces both `MultiAgentIndependentNetwork` (`marlbase/utils/models.py:133-173`)
and `MultiAgentSharedNetwork` (`:176-300`). The reference launches one
`torch.jit.fork` per network and regroups outputs per agent; on TPU the whole
construct collapses to:

- parameters stacked along a leading *group* axis (G groups for G distinct
  networks: G=1 full sharing, G=N independent, or selective groups from a
  `sharing_indices` list, mirroring `utils/models.py:192-197`),
- a static (N,) agent->group index,
- `jnp.take` of the stacked param pytree by that index (gradients scatter-add
  back into the group stack automatically), and
- a single `jax.vmap` of the underlying network apply over the agent axis.

All agents must share input/output sizes (the reference asserts this within
each sharing group, `utils/models.py:218-226`; here it is required globally
so the parameters stack — true for every env family shipped, where obs are
homogeneous across agents).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from codebase_tpu.models.networks import make_network_spec


def resolve_sharing(sharing: Union[bool, Sequence[int]], n_agents: int) -> Tuple[int, ...]:
    """Normalise a sharing spec to per-agent group labels 0..G-1.

    True -> all agents share one network; False -> one network per agent;
    list -> agents with equal entries share (`utils/models.py:192-197`).
    Labels are renumbered by first occurrence, matching the order in which
    the reference creates its networks (`utils/models.py:208-238`).
    """
    if sharing is True:
        raw = [0] * n_agents
    elif sharing is False or sharing is None:
        raw = list(range(n_agents))
    else:
        raw = list(sharing)
        assert len(raw) == n_agents, "Expect same number of sharing indices as agents"
    remap = {}
    groups = []
    for label in raw:
        if label not in remap:
            remap[label] = len(remap)
        groups.append(remap[label])
    return tuple(groups)


@dataclass(frozen=True)
class MultiAgentNetwork:
    """Static spec for N agents' networks with parameter sharing groups."""

    input_sizes: Tuple[int, ...]
    hidden_dims: Tuple[int, ...]
    output_sizes: Tuple[int, ...]
    sharing: Tuple[int, ...]  # per-agent group id, 0..G-1 (use `create`)
    use_rnn: bool = False
    use_orthogonal_init: bool = True
    compute_dtype: str = "float32"  # "bfloat16" = mixed-precision MXU matmuls

    @staticmethod
    def create(
        input_sizes: Sequence[int],
        hidden_dims: Sequence[int],
        output_sizes: Sequence[int],
        parameter_sharing: Union[bool, Sequence[int]] = False,
        use_rnn: bool = False,
        use_orthogonal_init: bool = True,
        compute_dtype: str = "float32",
    ) -> "MultiAgentNetwork":
        n_agents = len(input_sizes)
        assert len(output_sizes) == n_agents, "Expect same number of input and output sizes"
        in0, out0 = input_sizes[0], output_sizes[0]
        assert all(i == in0 for i in input_sizes) and all(o == out0 for o in output_sizes), (
            "stacked multi-agent container requires homogeneous obs/action sizes "
            "across agents"
        )
        return MultiAgentNetwork(
            input_sizes=tuple(int(i) for i in input_sizes),
            hidden_dims=tuple(int(h) for h in hidden_dims),
            output_sizes=tuple(int(o) for o in output_sizes),
            sharing=resolve_sharing(parameter_sharing, n_agents),
            use_rnn=use_rnn,
            use_orthogonal_init=use_orthogonal_init,
            compute_dtype=compute_dtype,
        )

    @property
    def n_agents(self) -> int:
        return len(self.input_sizes)

    @property
    def n_groups(self) -> int:
        return max(self.sharing) + 1

    @property
    def net(self):
        dims = (self.input_sizes[0],) + self.hidden_dims + (self.output_sizes[0],)
        return make_network_spec(dims, self.use_rnn, self.use_orthogonal_init, self.compute_dtype)

    @property
    def agent_to_group(self) -> jnp.ndarray:
        return jnp.asarray(np.array(self.sharing, dtype=np.int32))

    def init(self, key):
        """Stacked params: every leaf has leading axis G."""
        keys = jax.random.split(key, self.n_groups)
        return jax.vmap(self.net.init)(keys)

    def per_agent_params(self, params):
        """Gather (G, ...) -> (N, ...) params; AD scatter-adds grads back."""
        idx = self.agent_to_group
        return jax.tree.map(lambda p: jnp.take(p, idx, axis=0), params)

    def apply(self, params, inputs, hiddens=None):
        """Forward all agents at once.

        Args:
            params: stacked group params from `init`.
            inputs: (N, T, B, obs_dim).
            hiddens: (N, L, B, H) or None.
        Returns:
            (outputs (N, T, B, out_dim), new hiddens (N, L, B, H) or None).
        """
        agent_params = self.per_agent_params(params)
        net = self.net
        if self.use_rnn:
            if hiddens is None:
                hiddens = self.init_hiddens(inputs.shape[2])
            return jax.vmap(net.apply)(agent_params, inputs, hiddens)
        outs, _ = jax.vmap(lambda p, x: net.apply(p, x))(agent_params, inputs)
        return outs, None

    def init_hiddens(self, batch_size: int):
        """Zero hidden state (N, L, B, H), or None for MLP networks."""
        if not self.use_rnn:
            return None
        h = self.net.init_hiddens(batch_size)
        return jnp.broadcast_to(h, (self.n_agents,) + h.shape)
