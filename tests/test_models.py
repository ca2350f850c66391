"""Tests for the functional network library and multi-agent container."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from codebase_tpu.models import MLPSpec, RNNSpec, MultiAgentNetwork, QMixer
from codebase_tpu.models import distributions as D


class TestMLP:
    def test_shapes_and_orthogonality(self):
        spec = MLPSpec((7, 32, 32, 5))
        params = spec.init(jax.random.PRNGKey(0))
        x = jnp.ones((3, 4, 7))
        y, h = spec.apply(params, x)
        assert y.shape == (3, 4, 5)
        assert h is None
        # orthogonal init: W^T W = 2 * I for tall matrices (gain sqrt(2))
        w = np.asarray(params["layers"][0]["w"])  # (7, 32): rows orthogonal
        np.testing.assert_allclose(w @ w.T, 2 * np.eye(7), atol=1e-5)
        np.testing.assert_allclose(np.asarray(params["layers"][0]["b"]), 0)

    def test_relu_only_between_layers(self):
        spec = MLPSpec((2, 8, 4))
        params = spec.init(jax.random.PRNGKey(1))
        y, _ = spec.apply(params, jax.random.normal(jax.random.PRNGKey(2), (64, 2)))
        # output layer is linear (no final activation): negatives must appear
        assert np.asarray(y).min() < 0


class TestRNN:
    def test_shapes_and_state(self):
        spec = RNNSpec((6, 16, 16, 4))
        assert spec.num_rnn_layers == 1
        params = spec.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (5, 3, 6))
        y, h = spec.apply(params, x)
        assert y.shape == (5, 3, 4)
        assert h.shape == (1, 3, 16)

    def test_stateful_equals_full_sequence(self):
        """Running T steps one-at-a-time with carried hiddens == one call."""
        spec = RNNSpec((6, 16, 16, 4))
        params = spec.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (5, 3, 6))
        y_full, _ = spec.apply(params, x)
        h = spec.init_hiddens(3)
        ys = []
        for t in range(5):
            y, h = spec.apply(params, x[t : t + 1], h)
            ys.append(y[0])
        np.testing.assert_allclose(np.asarray(jnp.stack(ys)), np.asarray(y_full), atol=1e-5)


class TestMultiAgent:
    def test_independent_networks_differ(self):
        net = MultiAgentNetwork.create([4] * 3, [16, 16], [5] * 3, parameter_sharing=False)
        assert net.n_groups == 3
        params = net.init(jax.random.PRNGKey(0))
        x = jnp.broadcast_to(jnp.ones((4,)), (3, 2, 2, 4))
        y, _ = net.apply(params, x)
        assert y.shape == (3, 2, 2, 5)
        # independent params: same input -> different outputs per agent
        assert not np.allclose(np.asarray(y[0]), np.asarray(y[1]))

    def test_full_sharing_identical(self):
        net = MultiAgentNetwork.create([4] * 3, [16, 16], [5] * 3, parameter_sharing=True)
        assert net.n_groups == 1
        params = net.init(jax.random.PRNGKey(0))
        x = jnp.broadcast_to(jnp.ones((4,)), (3, 2, 2, 4))
        y, _ = net.apply(params, x)
        np.testing.assert_allclose(np.asarray(y[0]), np.asarray(y[1]), atol=1e-6)

    def test_selective_sharing_groups(self):
        net = MultiAgentNetwork.create(
            [4] * 4, [8], [3] * 4, parameter_sharing=[7, 9, 7, 9]
        )
        assert net.n_groups == 2
        assert net.sharing == (0, 1, 0, 1)
        params = net.init(jax.random.PRNGKey(0))
        x = jnp.broadcast_to(jnp.ones((4,)), (4, 1, 1, 4))
        y, _ = net.apply(params, x)
        np.testing.assert_allclose(np.asarray(y[0]), np.asarray(y[2]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(y[1]), np.asarray(y[3]), atol=1e-6)
        assert not np.allclose(np.asarray(y[0]), np.asarray(y[1]))

    def test_shared_gradients_accumulate(self):
        """Gradient wrt shared params sums across agents (take -> scatter-add)."""
        net = MultiAgentNetwork.create([2] * 2, [4], [1] * 2, parameter_sharing=True)
        params = net.init(jax.random.PRNGKey(0))
        x = jnp.ones((2, 1, 1, 2))

        def loss(p):
            y, _ = net.apply(p, x)
            return jnp.sum(y)

        g = jax.grad(loss)(params)
        # gradient leading axis is the group axis (G=1)
        assert g["layers"][0]["w"].shape[0] == 1

        net_solo = MultiAgentNetwork.create([2], [4], [1], parameter_sharing=True)
        g_solo = jax.grad(lambda p: jnp.sum(net_solo.apply(p, x[:1])[0]))(params)
        np.testing.assert_allclose(
            np.asarray(g["layers"][0]["w"]), 2 * np.asarray(g_solo["layers"][0]["w"]), atol=1e-6
        )

    def test_rnn_hiddens_shape(self):
        net = MultiAgentNetwork.create([4] * 2, [8, 8], [3] * 2, use_rnn=True)
        h = net.init_hiddens(5)
        assert h.shape == (2, 1, 5, 8)
        params = net.init(jax.random.PRNGKey(0))
        x = jnp.ones((2, 7, 5, 4))
        y, h2 = net.apply(params, x, h)
        assert y.shape == (2, 7, 5, 3)
        assert h2.shape == h.shape


class TestQMixer:
    def test_monotonicity(self):
        """Q_tot must be non-decreasing in every agent utility."""
        mixer = QMixer(n_agents=3, state_dim=10, embed_dim=8, hypernet_layers=2, hypernet_embed=8)
        params = mixer.init(jax.random.PRNGKey(0))
        states = jax.random.normal(jax.random.PRNGKey(1), (4, 5, 10))
        qs = jax.random.normal(jax.random.PRNGKey(2), (3, 4, 5))
        y0 = mixer.apply(params, qs, states)
        assert y0.shape == (4, 5)
        for agent in range(3):
            bumped = qs.at[agent].add(1.0)
            y1 = mixer.apply(params, bumped, states)
            assert np.all(np.asarray(y1) >= np.asarray(y0) - 1e-6)

    def test_hypernet_one_layer(self):
        mixer = QMixer(n_agents=2, state_dim=6, embed_dim=4, hypernet_layers=1, hypernet_embed=8)
        params = mixer.init(jax.random.PRNGKey(0))
        y = mixer.apply(params, jnp.ones((2, 3, 2)), jnp.ones((3, 2, 6)))
        assert y.shape == (3, 2)

    def test_invalid_layers(self):
        with pytest.raises(ValueError):
            QMixer(n_agents=2, state_dim=6, embed_dim=4, hypernet_layers=3, hypernet_embed=8)


class TestDistributions:
    def test_mask_blocks_sampling(self):
        logits = jnp.zeros((100, 4))
        mask = jnp.asarray([[1.0, 0.0, 1.0, 0.0]] * 100)
        masked = D.apply_mask(logits, mask)
        acts = np.asarray(D.sample(jax.random.PRNGKey(0), masked))
        assert set(np.unique(acts)) <= {0, 2}

    def test_log_prob_and_entropy(self):
        logits = jnp.log(jnp.asarray([[0.25, 0.75]]))
        lp = D.log_prob(logits, jnp.asarray([1]))
        np.testing.assert_allclose(np.asarray(lp), np.log(0.75), rtol=1e-5)
        ent = D.entropy(logits)
        expected = -(0.25 * np.log(0.25) + 0.75 * np.log(0.75))
        np.testing.assert_allclose(np.asarray(ent), expected, rtol=1e-5)

    def test_masked_entropy_finite(self):
        logits = jnp.zeros((1, 4))
        mask = jnp.asarray([[1.0, 1.0, 0.0, 0.0]])
        ent = D.entropy(D.apply_mask(logits, mask))
        np.testing.assert_allclose(np.asarray(ent), np.log(2), rtol=1e-4)


class TestLSTMParity:
    """LSTM cell support (`marlbase/utils/models.py:73`: make_network accepts
    nn.GRU or nn.LSTM), validated against torch's reference implementation."""

    def _torch_rnn_net(self, params, cell, in_dim, hidden, n_layers, out_dim):
        import torch

        first = torch.nn.Linear(in_dim, hidden)
        rnn_cls = torch.nn.LSTM if cell == "lstm" else torch.nn.GRU
        rnn = rnn_cls(hidden, hidden, num_layers=n_layers, batch_first=False)
        final = torch.nn.Linear(hidden, out_dim)
        with torch.no_grad():
            first.weight.copy_(torch.from_numpy(np.asarray(params["first"]["w"]).T))
            first.bias.copy_(torch.from_numpy(np.asarray(params["first"]["b"])))
            for layer in range(n_layers):
                lp = params["rnn"][layer]
                getattr(rnn, f"weight_ih_l{layer}").copy_(
                    torch.from_numpy(np.asarray(lp["w_ih"]).T))
                getattr(rnn, f"weight_hh_l{layer}").copy_(
                    torch.from_numpy(np.asarray(lp["w_hh"]).T))
                getattr(rnn, f"bias_ih_l{layer}").copy_(
                    torch.from_numpy(np.asarray(lp["b_ih"])))
                getattr(rnn, f"bias_hh_l{layer}").copy_(
                    torch.from_numpy(np.asarray(lp["b_hh"])))
            final.weight.copy_(torch.from_numpy(np.asarray(params["final"]["w"]).T))
            final.bias.copy_(torch.from_numpy(np.asarray(params["final"]["b"])))
        return first, rnn, final

    @pytest.mark.parametrize("cell", ["gru", "lstm"])
    def test_rnn_spec_matches_torch(self, cell):
        """Our scan-based RNN forward == torch nn.GRU/nn.LSTM with the same
        weights. Torch LSTM gate order [i, f, g, o] / GRU [r, z, n]."""
        import torch

        from codebase_tpu.models.networks import RNNSpec

        T, B, in_dim, hidden, out_dim = 7, 3, 5, 8, 4
        spec = RNNSpec(dims=(in_dim, hidden, hidden, hidden, out_dim), cell=cell)
        n_layers = spec.num_rnn_layers
        params = spec.init(jax.random.PRNGKey(0))
        x = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (T, B, in_dim)))

        y, h = spec.apply(params, jnp.asarray(x))

        first, rnn, final = self._torch_rnn_net(params, cell, in_dim, hidden, n_layers, out_dim)
        with torch.no_grad():
            z = torch.relu(first(torch.from_numpy(x).float()))
            z, _ = rnn(z)
            expected = final(z).numpy()
        np.testing.assert_allclose(np.asarray(y), expected, atol=1e-5)

    def test_lstm_stateful_equals_full_sequence(self):
        """Stepping one timestep at a time through the carried (h, c) state
        equals one full-sequence apply."""
        from codebase_tpu.models.networks import RNNSpec

        spec = RNNSpec(dims=(5, 8, 8, 4), cell="lstm")
        params = spec.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (6, 2, 5))
        y_full, h_full = spec.apply(params, x)
        h = spec.init_hiddens(2)
        outs = []
        for t in range(6):
            yt, h = spec.apply(params, x[t : t + 1], h)
            outs.append(yt)
        np.testing.assert_allclose(
            np.asarray(jnp.concatenate(outs)), np.asarray(y_full), atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(h), np.asarray(h_full), atol=1e-5)

    def test_use_rnn_cell_choice(self):
        from codebase_tpu.models.networks import RNNSpec, make_network_spec

        assert make_network_spec((4, 8, 8, 2), use_rnn=True).cell == "gru"
        assert make_network_spec((4, 8, 8, 2), use_rnn="lstm").cell == "lstm"
        assert not isinstance(make_network_spec((4, 8, 2), use_rnn=False), RNNSpec)
        with pytest.raises(ValueError):
            make_network_spec((4, 8, 8, 2), use_rnn="elman")

    def test_lstm_multi_agent_container(self):
        net = MultiAgentNetwork.create(
            input_sizes=[5, 5], hidden_dims=[8, 8], output_sizes=[3, 3],
            parameter_sharing=False, use_rnn="lstm",
        )
        params = net.init(jax.random.PRNGKey(0))
        h = net.init_hiddens(4)
        assert h.shape == (2, 1, 4, 16)  # (N, L, B, 2H): h and c concatenated
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 4, 5))
        y, h2 = net.apply(params, x, h)
        assert y.shape == (2, 6, 4, 3) and h2.shape == h.shape
        assert np.isfinite(np.asarray(y)).all()


class TestHeterogeneousAgents:
    """Per-agent obs/action sizes may differ across sharing groups
    (`marlbase/utils/models.py:133-173,218-226`: the reference asserts size
    equality only within a group). Implemented by pad-to-max stacking."""

    def _hetero_net(self, use_rnn=False):
        return MultiAgentNetwork.create(
            input_sizes=[4, 6, 6], hidden_dims=[8, 8], output_sizes=[3, 5, 5],
            parameter_sharing=[0, 1, 1], use_rnn=use_rnn,
        )

    def test_forward_matches_true_size_group_nets(self):
        """Container output on zero-padded inputs == each group's TRUE-size
        network applied to the unpadded inputs."""
        net = self._hetero_net()
        params = net.init(jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(1)
        x0 = jax.random.normal(key, (2, 3, 4))  # agent 0: obs_dim 4
        x1 = jax.random.normal(jax.random.split(key)[0], (2, 3, 6))
        x = jnp.zeros((3, 2, 3, 6))
        x = x.at[0, :, :, :4].set(x0).at[1].set(x1).at[2].set(x1)
        y, _ = net.apply(params, x)
        assert y.shape == (3, 2, 3, 5)

        # group 0 (agent 0): true-size net on unpadded input
        g0 = net.group_net(0)
        p0 = jax.tree.map(lambda p: p[0], params)
        p0_true = jax.tree.map(
            lambda p, t: p[tuple(slice(0, s) for s in t.shape)],
            p0, jax.eval_shape(g0.init, key),
        )
        y0, _ = g0.apply(p0_true, x0)
        np.testing.assert_allclose(np.asarray(y[0, :, :, :3]), np.asarray(y0), atol=1e-5)
        # padded outputs of agent 0 are exactly zero (zero-padded weights)
        np.testing.assert_array_equal(np.asarray(y[0, :, :, 3:]), 0.0)
        # agents 1 and 2 share group 1 -> identical outputs on identical input
        np.testing.assert_allclose(np.asarray(y[1]), np.asarray(y[2]), atol=1e-6)

    def test_gradients_do_not_leak_into_padding(self):
        """With zero-padded inputs and a loss over valid outputs only, the
        padded weight rows/cols receive exactly zero gradient."""
        net = self._hetero_net()
        params = net.init(jax.random.PRNGKey(0))
        x = jnp.zeros((3, 2, 3, 6))
        x = x.at[0, :, :, :4].set(1.0).at[1:].set(0.5)
        mask = net.output_mask  # (3, 5)

        def loss(p):
            y, _ = net.apply(p, x)
            return jnp.sum((y * mask[:, None, None, :]) ** 2)

        grads = jax.grad(loss)(params)
        g_first = grads["layers"][0]["w"]  # (G, in_max, H)
        # group 0's true input dim is 4: padded rows 4:6 get zero grad
        np.testing.assert_array_equal(np.asarray(g_first[0, 4:]), 0.0)
        # ...but real rows do receive gradient
        assert np.abs(np.asarray(g_first[0, :4])).sum() > 0
        g_last = grads["layers"][-1]["w"]  # (G, H, out_max)
        # group 0's true output dim is 3: padded cols 3:5 get zero grad
        np.testing.assert_array_equal(np.asarray(g_last[0, :, 3:]), 0.0)
        assert np.abs(np.asarray(g_last[0, :, :3])).sum() > 0

    def test_output_mask(self):
        net = self._hetero_net()
        np.testing.assert_array_equal(
            np.asarray(net.output_mask),
            [[1, 1, 1, 0, 0], [1, 1, 1, 1, 1], [1, 1, 1, 1, 1]],
        )

    def test_within_group_size_mismatch_raises(self):
        with pytest.raises(AssertionError, match="sharing network"):
            MultiAgentNetwork.create(
                input_sizes=[4, 6], hidden_dims=[8], output_sizes=[3, 3],
                parameter_sharing=True,
            )

    def test_hetero_rnn_forward(self):
        net = self._hetero_net(use_rnn="lstm")
        params = net.init(jax.random.PRNGKey(0))
        x = jnp.zeros((3, 4, 2, 6)).at[:, :, :, :4].set(0.3)
        y, h = net.apply(params, x)
        assert y.shape == (3, 4, 2, 5) and h.shape == (3, 1, 2, 16)
        assert np.isfinite(np.asarray(y)).all()
