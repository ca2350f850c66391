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
