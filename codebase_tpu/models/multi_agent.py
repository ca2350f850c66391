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

Heterogeneous agents: the reference only requires equal sizes *within* each
sharing group (`utils/models.py:218-226`) — its independent path allows every
agent a different obs/action size. Here heterogeneity is supported by
pad-to-max stacking: each group's network is initialised at its TRUE dims
(preserving the reference's fan-in-dependent init distributions exactly) and
zero-padded to the max input/output size so all groups stack into one pytree.
Zero input padding guarantees padded weight rows contribute nothing to the
forward pass and receive zero gradients; padded output columns are zero-
initialised and stay zero as long as the caller never consumes outputs beyond
`output_sizes[i]` — `output_mask` gives the (N, max_out) validity mask
(heterogeneous-action envs must also expose an action mask, which every loss
in this framework already threads through).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Sequence, Tuple, Union

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
    use_rnn: Any = False  # False | True (gru) | "gru" | "lstm"
    use_orthogonal_init: bool = True
    compute_dtype: str = "float32"  # "bfloat16" = mixed-precision MXU matmuls
    fused_rnn: str = "auto"  # pallas fused GRU recurrence (ops/fused_gru.py)

    @staticmethod
    def create(
        input_sizes: Sequence[int],
        hidden_dims: Sequence[int],
        output_sizes: Sequence[int],
        parameter_sharing: Union[bool, Sequence[int]] = False,
        use_rnn: Any = False,
        use_orthogonal_init: bool = True,
        compute_dtype: str = "float32",
        fused_rnn: str = "auto",
    ) -> "MultiAgentNetwork":
        n_agents = len(input_sizes)
        assert len(output_sizes) == n_agents, "Expect same number of input and output sizes"
        sharing = resolve_sharing(parameter_sharing, n_agents)
        # the reference asserts size equality only WITHIN a sharing group
        # (`utils/models.py:218-226`); agents in different groups may differ
        for g in range(max(sharing) + 1):
            members = [i for i, s in enumerate(sharing) if s == g]
            first = members[0]
            assert all(
                input_sizes[i] == input_sizes[first]
                and output_sizes[i] == output_sizes[first]
                for i in members
            ), (
                f"agents sharing network {g} must have equal obs/action sizes "
                f"(got inputs {[input_sizes[i] for i in members]}, "
                f"outputs {[output_sizes[i] for i in members]})"
            )
        return MultiAgentNetwork(
            input_sizes=tuple(int(i) for i in input_sizes),
            hidden_dims=tuple(int(h) for h in hidden_dims),
            output_sizes=tuple(int(o) for o in output_sizes),
            sharing=sharing,
            use_rnn=use_rnn,
            use_orthogonal_init=use_orthogonal_init,
            compute_dtype=compute_dtype,
            fused_rnn=str(fused_rnn),
        )

    @property
    def n_agents(self) -> int:
        return len(self.input_sizes)

    @property
    def n_groups(self) -> int:
        return max(self.sharing) + 1

    @property
    def homogeneous(self) -> bool:
        return (
            all(i == self.input_sizes[0] for i in self.input_sizes)
            and all(o == self.output_sizes[0] for o in self.output_sizes)
        )

    @property
    def max_input_size(self) -> int:
        return max(self.input_sizes)

    @property
    def max_output_size(self) -> int:
        return max(self.output_sizes)

    @property
    def net(self):
        """The (padded-to-max) stacked network spec."""
        dims = (self.max_input_size,) + self.hidden_dims + (self.max_output_size,)
        return make_network_spec(
            dims, self.use_rnn, self.use_orthogonal_init, self.compute_dtype,
            self.fused_rnn,
        )

    def group_net(self, g: int):
        """Group g's TRUE-size network spec (init distributions depend on
        fan-in, so heterogeneous groups must be initialised at true dims)."""
        first = self.sharing.index(g)
        dims = (self.input_sizes[first],) + self.hidden_dims + (self.output_sizes[first],)
        return make_network_spec(
            dims, self.use_rnn, self.use_orthogonal_init, self.compute_dtype,
            self.fused_rnn,
        )

    @property
    def agent_to_group(self) -> jnp.ndarray:
        return jnp.asarray(np.array(self.sharing, dtype=np.int32))

    @property
    def output_mask(self) -> jnp.ndarray:
        """(N, max_out) float32: 1 where an output index is a real action of
        agent i, 0 where it is stack padding."""
        a = np.arange(self.max_output_size)[None, :]
        return jnp.asarray(a < np.array(self.output_sizes)[:, None], jnp.float32)

    def init(self, key):
        """Stacked params: every leaf has leading axis G."""
        keys = jax.random.split(key, self.n_groups)
        if self.homogeneous:
            return jax.vmap(self.net.init)(keys)
        # heterogeneous: init each group at its true dims, zero-pad every
        # leaf up to the padded spec's shape, then stack along the group axis
        target = jax.eval_shape(self.net.init, keys[0])

        def pad_to(small, big):
            pads = [(0, t - s) for s, t in zip(small.shape, big.shape)]
            return jnp.pad(small, pads)

        group_params = [
            jax.tree.map(pad_to, self.group_net(g).init(k), target)
            for g, k in enumerate(keys)
        ]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *group_params)

    def per_agent_params(self, params):
        """Gather (G, ...) -> (N, ...) params; AD scatter-adds grads back."""
        idx = self.agent_to_group
        return jax.tree.map(lambda p: jnp.take(p, idx, axis=0), params)

    def apply(self, params, inputs, hiddens=None):
        """Forward all agents at once.

        Args:
            params: stacked group params from `init`.
            inputs: (N, T, B, max_input_size) — heterogeneous agents must be
                zero-padded beyond their own obs_dim.
            hiddens: (N, L, B, C) or None.
        Returns:
            (outputs (N, T, B, max_output_size), new hiddens or None).
            For heterogeneous agents, outputs beyond `output_sizes[i]` are
            padding (zero at init) — mask with `output_mask` before use.
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
        """Zero hidden state (N, L, B, C), or None for MLP networks."""
        if not self.use_rnn:
            return None
        h = self.net.init_hiddens(batch_size)
        return jnp.broadcast_to(h, (self.n_agents,) + h.shape)
