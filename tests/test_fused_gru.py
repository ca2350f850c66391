"""Fused pallas GRU kernel vs the lax.scan reference cell.

Runs the kernel in pallas interpreter mode (CPU backend); the compiled
Mosaic path is exercised on real TPU by `scripts/rnn_kernel_bench.py` and by
any RNN training run with `model.fused_rnn=true`.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from codebase_tpu.models.networks import gru_cell, gru_layer_init
from codebase_tpu.ops.fused_gru import fused_gru_sequence, gru_layer_sequence


def _scan_reference(gi, w_hh, b_hh, h0):
    """Scan of the same recurrence the kernel fuses (gru_cell with the input
    projection pre-applied)."""

    def step(h, gi_t):
        gh = h @ w_hh + b_hh
        H = h.shape[-1]
        r = jax.nn.sigmoid(gi_t[:, :H] + gh[:, :H])
        z = jax.nn.sigmoid(gi_t[:, H : 2 * H] + gh[:, H : 2 * H])
        n = jnp.tanh(gi_t[:, 2 * H :] + r * gh[:, 2 * H :])
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    hT, y = jax.lax.scan(step, h0, gi)
    return y, hT


def _make(T=7, B=24, H=128, seed=0):
    k = jax.random.split(jax.random.PRNGKey(seed), 4)
    gi = jax.random.normal(k[0], (T, B, 3 * H), jnp.float32)
    w_hh = jax.random.normal(k[1], (H, 3 * H), jnp.float32) * 0.1
    b_hh = jax.random.normal(k[2], (3 * H,), jnp.float32) * 0.1
    h0 = jax.random.normal(k[3], (B, H), jnp.float32)
    return gi, w_hh, b_hh, h0


@pytest.mark.parametrize("B", [24, 32])  # 24 exercises the pad-to-tile path
def test_forward_matches_scan(B):
    gi, w_hh, b_hh, h0 = _make(B=B)
    y_ref, hT_ref = _scan_reference(gi, w_hh, b_hh, h0)
    y, hT = fused_gru_sequence(gi, w_hh, b_hh, h0, True)
    np.testing.assert_allclose(y, y_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(hT, hT_ref, rtol=1e-5, atol=1e-5)


def test_gradients_match_scan():
    gi, w_hh, b_hh, h0 = _make(T=5, B=16)
    kw = jax.random.normal(jax.random.PRNGKey(9), (16, 128))

    def loss(fn, gi, w_hh, b_hh, h0):
        y, hT = fn(gi, w_hh, b_hh, h0)
        return jnp.sum(y * y[::-1]) * 1e-2 + jnp.sum(hT * kw)

    ref_grads = jax.grad(functools.partial(loss, _scan_reference), argnums=(0, 1, 2, 3))(
        gi, w_hh, b_hh, h0
    )
    def fused(gi, w_hh, b_hh, h0):
        # nondiff args of a custom_vjp must be positional
        return fused_gru_sequence(gi, w_hh, b_hh, h0, True)
    got_grads = jax.grad(functools.partial(loss, fused), argnums=(0, 1, 2, 3))(
        gi, w_hh, b_hh, h0
    )
    for g, r, name in zip(got_grads, ref_grads, ["dgi", "dw_hh", "db_hh", "dh0"]):
        np.testing.assert_allclose(g, r, rtol=2e-4, atol=2e-4, err_msg=name)


def test_multi_tile_interleaved_carry(monkeypatch):
    """Force several batch tiles (the interleaved carry-store path, riskiest
    part of the round-4 redesign): at the default VMEM budget B<=32 is a
    single tile, so pin the tile size small instead. Covers T % K != 0 and
    B % Bt != 0 simultaneously; asserts value AND grad parity vs scan."""
    from codebase_tpu.ops import fused_gru as fg

    monkeypatch.setattr(fg, "_batch_tile", lambda B, H, f, K: 16)
    gi, w_hh, b_hh, h0 = _make(T=7, B=40)  # 3 tiles of 16 (B_pad=48), T_pad=8

    y_ref, hT_ref = _scan_reference(gi, w_hh, b_hh, h0)
    y, hT = fg.fused_gru_sequence(gi, w_hh, b_hh, h0, True)
    np.testing.assert_allclose(y, y_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(hT, hT_ref, rtol=1e-5, atol=1e-5)

    def loss(fn, *args):
        y, hT = fn(*args)
        return jnp.sum(y * y[::-1]) * 1e-2 + jnp.sum(hT**2)

    ref_g = jax.grad(functools.partial(loss, _scan_reference), argnums=(0, 1, 2, 3))(
        gi, w_hh, b_hh, h0
    )
    got_g = jax.grad(
        functools.partial(loss, lambda *a: fg.fused_gru_sequence(*a, True)),
        argnums=(0, 1, 2, 3),
    )(gi, w_hh, b_hh, h0)
    for g, r, name in zip(got_g, ref_g, ["dgi", "dw_hh", "db_hh", "dh0"]):
        np.testing.assert_allclose(g, r, rtol=2e-4, atol=2e-4, err_msg=name)


def test_oversized_batch_raises():
    """The (B_pad, H) carry store is VMEM-resident and cannot be tiled; an
    oversized batch must fail loudly, not deep inside Mosaic."""
    H = 128
    B = 24576  # B*H*4 ~ 12.6MB > the 10MB budget
    gi = jnp.zeros((1, B, 3 * H))
    with pytest.raises(ValueError, match="carry store"):
        fused_gru_sequence(gi, jnp.zeros((H, 3 * H)), jnp.zeros((3 * H,)), jnp.zeros((B, H)), True)


def test_layer_sequence_matches_cell_scan():
    """Full layer entry point vs RNNSpec's gru_cell scan, torch init."""
    H = 128
    params = gru_layer_init(jax.random.PRNGKey(3), H, H)
    x = jax.random.normal(jax.random.PRNGKey(4), (6, 16, H))
    h0 = jnp.zeros((16, H))

    def step(h, xt):
        hn = gru_cell(params, xt, h)
        return hn, hn

    hT_ref, y_ref = jax.lax.scan(step, h0, x)
    y, hT = gru_layer_sequence(params, x, h0, interpret=True)
    np.testing.assert_allclose(y, y_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(hT, hT_ref, rtol=1e-5, atol=1e-5)


def test_rnnspec_fused_matches_scan_path():
    """The RNNSpec integration point: same params, fused vs scan apply."""
    from codebase_tpu.models.networks import make_network_spec

    scan_spec = make_network_spec((9, 128, 128, 5), use_rnn=True, fused_rnn="off")
    fused_spec = make_network_spec((9, 128, 128, 5), use_rnn=True, fused_rnn="interpret")
    params = scan_spec.init(jax.random.PRNGKey(5))
    x = jax.random.normal(jax.random.PRNGKey(6), (8, 12, 9))

    y_ref, h_ref = scan_spec.apply(params, x)
    y, hT = fused_spec.apply(params, x)
    np.testing.assert_allclose(y, y_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(hT, h_ref, rtol=1e-5, atol=1e-5)

    def loss(spec, p):
        y, _ = spec.apply(p, x)
        return jnp.sum(y**2)

    g_ref = jax.grad(functools.partial(loss, scan_spec))(params)
    g = jax.grad(functools.partial(loss, fused_spec))(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4), g, g_ref
    )


def test_multi_agent_container_fused():
    """Stacked-params container forward with the fused kernel under vmap."""
    from codebase_tpu.models.multi_agent import MultiAgentNetwork

    kwargs = dict(
        input_sizes=[7, 7],
        hidden_dims=[128, 128],
        output_sizes=[4, 4],
        parameter_sharing=False,
        use_rnn="gru",
    )
    net_scan = MultiAgentNetwork.create(fused_rnn="off", **kwargs)
    net_fused = MultiAgentNetwork.create(fused_rnn="interpret", **kwargs)
    params = net_scan.init(jax.random.PRNGKey(7))
    x = jax.random.normal(jax.random.PRNGKey(8), (2, 5, 6, 7))  # (N, T, B, D)

    y_ref, h_ref = net_scan.apply(params, x)
    y, hT = net_fused.apply(params, x)
    np.testing.assert_allclose(y, y_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(hT, h_ref, rtol=1e-5, atol=1e-5)


def test_vmap_over_stacked_agents():
    """The multi-agent container vmaps apply over a stacked param axis; the
    kernel must hold under that vmap (pallas batching rule)."""
    N, T, B, H = 3, 4, 16, 128
    keys = jax.random.split(jax.random.PRNGKey(11), N)
    params = jax.vmap(lambda k: gru_layer_init(k, H, H))(keys)
    x = jax.random.normal(jax.random.PRNGKey(12), (N, T, B, H))
    h0 = jnp.zeros((N, B, H))

    fused = jax.vmap(lambda p, xx, hh: gru_layer_sequence(p, xx, hh, interpret=True))
    y, hT = fused(params, x, h0)

    def one(p, xx, hh):
        def step(h, xt):
            hn = gru_cell(p, xt, h)
            return hn, hn

        hT_ref, y_ref = jax.lax.scan(step, hh, xx)
        return y_ref, hT_ref

    y_ref, hT_ref = jax.vmap(one)(params, x, h0)
    np.testing.assert_allclose(y, y_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(hT, hT_ref, rtol=1e-5, atol=1e-5)
