"""Pallas TPU kernel: a GRU layer fused over the whole time axis.

Why this kernel exists (the BPTT hot path): the reference runs its GRU over a
full `(T, B, feat)` episode in one `nn.GRU` call during every update
(`marlbase/utils/models.py:106-116`; losses BPTT through it,
`dqn/model.py:118-163`). The straightforward TPU translation is
`jax.lax.scan` of a GRU cell (see `models/networks.py:gru_cell`), but XLA
compiles a scan into a sequential while-loop whose body re-reads the
recurrent weights and hidden state from HBM every timestep — at T=25..500
that is T round-trips for operands that never change. This kernel runs the
entire recurrence in ONE pallas_call:

- the input projection `x @ w_ih + b_ih` stays OUTSIDE the kernel: over the
  folded `(T*B, in)` batch it is one large MXU matmul that XLA already
  schedules at speed-of-light — fusing it would only rebuild XLA;
- the sequential part — `h_t = GRU(gi_t, h_{t-1} @ w_hh + b_hh)` — loops
  over T inside the kernel with `w_hh`, `b_hh` and the carry pinned in VMEM,
  so HBM traffic is exactly one read of `gi` + one write of the outputs;
- the batch axis is tiled over the pallas grid (each tile's recurrence is
  independent), keeping VMEM under `_VMEM_BUDGET` at any B;
- the backward pass is a second pallas kernel (registered via
  `jax.custom_vjp`) that walks time in reverse and REMATERIALISES the gates
  from the saved layer outputs (`h_{t-1}` and `gi_t` reproduce r/z/n with one
  extra VMEM-resident matmul) instead of saving activations — the classic
  trade of FLOPs for HBM bandwidth, which is what BPTT on TPU is bound by.

`fused_gru_sequence` is numerically equivalent to scanning
`networks.gru_cell` (same torch gate convention/order) and is exercised
against it — values and grads — in `tests/test_fused_gru.py` (interpret
mode on the CPU backend; the real Mosaic path runs on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM high-water budget for picking the batch tile (bytes). v5e cores have
# ~16MB less double-buffering headroom; stay well under.
_VMEM_BUDGET = 8 * 1024 * 1024


def _batch_tile(T: int, B: int, H: int) -> int:
    """Largest multiple-of-8 batch tile whose working set fits the budget.

    Working set per tile ≈ gi (T,Bt,3H) + y (T,Bt,H) + grads mirror (bwd) of
    the same, in f32: ~ 2 * T*Bt*4H * 4 bytes.
    """
    per_b = 2 * T * 4 * H * 4
    tile = max(8, min(B, _VMEM_BUDGET // max(per_b, 1)))
    return max(8, (tile // 8) * 8)


def _gates(gi_t, gh):
    """Torch gate convention: [reset, update, new] along the 3H axis."""
    H = gh.shape[-1] // 3
    r = jax.nn.sigmoid(gi_t[:, :H] + gh[:, :H])
    z = jax.nn.sigmoid(gi_t[:, H : 2 * H] + gh[:, H : 2 * H])
    n = jnp.tanh(gi_t[:, 2 * H :] + r * gh[:, 2 * H :])
    return r, z, n


def _fwd_kernel(gi_ref, whh_ref, bhh_ref, h0_ref, y_ref, hT_ref):
    """One batch tile: h_t = (1-z)n + z h_{t-1} for t in [0, T)."""
    T = gi_ref.shape[0]
    whh = whh_ref[:]
    bhh = bhh_ref[:]

    def step(t, h):
        gh = jnp.dot(h, whh, preferred_element_type=jnp.float32) + bhh
        r, z, n = _gates(gi_ref[t], gh)
        h_new = (1.0 - z) * n + z * h
        y_ref[t] = h_new
        return h_new

    hT_ref[:] = jax.lax.fori_loop(0, T, step, h0_ref[:])


def _bwd_kernel(
    gi_ref, whh_ref, bhh_ref, h0_ref, y_ref, dy_ref, dhT_ref,
    dgi_ref, dwhh_ref, dbhh_ref, dh0_ref,
):
    """Reverse-time tile: remat gates from (h_{t-1}, gi_t), accumulate dw_hh
    and db_hh across batch tiles (TPU grid steps run sequentially, so the
    read-modify-write on the shared output block is race-free)."""
    T, _, H3 = gi_ref.shape
    H = H3 // 3
    whh = whh_ref[:]
    bhh = bhh_ref[:]

    @pl.when(pl.program_id(0) == 0)
    def _():
        dwhh_ref[:] = jnp.zeros_like(dwhh_ref)
        dbhh_ref[:] = jnp.zeros_like(dbhh_ref)

    def step(i, carry):
        t = T - 1 - i
        dh, dwhh, dbhh = carry
        h_prev = jax.lax.cond(
            t > 0, lambda: y_ref[jnp.maximum(t - 1, 0)], lambda: h0_ref[:]
        )
        gh = jnp.dot(h_prev, whh, preferred_element_type=jnp.float32) + bhh
        gi_t = gi_ref[t]
        r, z, n = _gates(gi_t, gh)

        dh_total = dy_ref[t] + dh
        dn = dh_total * (1.0 - z)
        dz = dh_total * (h_prev - n)
        dpre_n = dn * (1.0 - n * n)
        dr = dpre_n * gh[:, 2 * H :]
        dpre_r = dr * r * (1.0 - r)
        dpre_z = dz * z * (1.0 - z)
        dgh_n = dpre_n * r
        dgh = jnp.concatenate([dpre_r, dpre_z, dgh_n], axis=-1)
        dgi_ref[t] = jnp.concatenate([dpre_r, dpre_z, dpre_n], axis=-1)

        dh_prev = dh_total * z + jax.lax.dot_general(
            dgh, whh,
            dimension_numbers=(((1,), (1,)), ((), ())),  # dgh @ whh.T
            preferred_element_type=jnp.float32,
        )
        dwhh = dwhh + jax.lax.dot_general(
            h_prev, dgh,
            dimension_numbers=(((0,), (0,)), ((), ())),  # h_prev.T @ dgh
            preferred_element_type=jnp.float32,
        )
        dbhh = dbhh + jnp.sum(dgh, axis=0)
        return dh_prev, dwhh, dbhh

    dh0, dwhh, dbhh = jax.lax.fori_loop(
        0, T, step, (dhT_ref[:], jnp.zeros_like(dwhh_ref), jnp.zeros_like(dbhh_ref))
    )
    dh0_ref[:] = dh0
    dwhh_ref[:] += dwhh
    dbhh_ref[:] += dbhh


def _pad_batch(x, B_pad, axis):
    if x.shape[axis] == B_pad:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, B_pad - x.shape[axis])
    return jnp.pad(x, pad)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_gru_sequence(gi, w_hh, b_hh, h0, interpret=False):
    """Run a GRU recurrence over a whole sequence in one fused TPU kernel.

    Args:
      gi: (T, B, 3H) precomputed input projection `x @ w_ih + b_ih`
          (torch gate order [r, z, n]).
      w_hh: (H, 3H) recurrent weights.  b_hh: (3H,).  h0: (B, H).
      interpret: run in pallas interpreter mode (CPU tests).
    Returns:
      (y, hT): layer outputs (T, B, H) and final hidden (B, H).
    Equivalent to `lax.scan(gru_cell)` in `models/networks.py` and
    differentiable via a fused reverse-time kernel (see module docstring).
    """
    y, hT = _fused_gru_fwd_impl(gi, w_hh, b_hh, h0, interpret)
    return y, hT


def _fused_gru_fwd_impl(gi, w_hh, b_hh, h0, interpret):
    T, B, H3 = gi.shape
    H = H3 // 3
    Bt = _batch_tile(T, B, H)
    B_pad = -(-B // Bt) * Bt
    gi_p = _pad_batch(gi, B_pad, 1)
    h0_p = _pad_batch(h0, B_pad, 0)
    grid = (B_pad // Bt,)

    y, hT = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, Bt, H3), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H3,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((T, Bt, H), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B_pad, H), jnp.float32),
            jax.ShapeDtypeStruct((B_pad, H), jnp.float32),
        ],
        interpret=interpret,
    )(gi_p.astype(jnp.float32), w_hh.astype(jnp.float32), b_hh.astype(jnp.float32), h0_p.astype(jnp.float32))
    return y[:, :B], hT[:B]


def _fused_gru_fwd(gi, w_hh, b_hh, h0, interpret):
    # custom_vjp: f_fwd keeps the primal signature; only f_bwd receives the
    # nondiff args (interpret) prepended.
    y, hT = _fused_gru_fwd_impl(gi, w_hh, b_hh, h0, interpret)
    return (y, hT), (gi, w_hh, b_hh, h0, y)


def _fused_gru_bwd(interpret, residuals, cotangents):
    gi, w_hh, b_hh, h0, y = residuals
    dy, dhT = cotangents
    T, B, H3 = gi.shape
    H = H3 // 3
    Bt = _batch_tile(T, B, H)
    B_pad = -(-B // Bt) * Bt
    grid = (B_pad // Bt,)

    f32 = jnp.float32
    args = (
        _pad_batch(gi, B_pad, 1).astype(f32),
        w_hh.astype(f32),
        b_hh.astype(f32),
        _pad_batch(h0, B_pad, 0).astype(f32),
        _pad_batch(y, B_pad, 1).astype(f32),
        _pad_batch(dy, B_pad, 1).astype(f32),
        _pad_batch(dhT, B_pad, 0).astype(f32),
    )
    dgi, dwhh, dbhh, dh0 = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, Bt, H3), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H3,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, Bt, H), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, Bt, H), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((T, Bt, H3), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            # dw_hh/db_hh: every grid step maps to the SAME block and
            # accumulates (sequential TPU grid ⇒ safe read-modify-write)
            pl.BlockSpec((H, H3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H3,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B_pad, H3), f32),
            jax.ShapeDtypeStruct((H, H3), f32),
            jax.ShapeDtypeStruct((H3,), f32),
            jax.ShapeDtypeStruct((B_pad, H), f32),
        ],
        interpret=interpret,
    )(*args)
    return (
        dgi[:, :B].astype(gi.dtype),
        dwhh.astype(w_hh.dtype),
        dbhh.astype(b_hh.dtype),
        dh0[:B].astype(h0.dtype),
    )


fused_gru_sequence.defvjp(_fused_gru_fwd, _fused_gru_bwd)


def gru_layer_sequence(params, x, h0, compute_dtype="float32", interpret=False):
    """Full fused GRU layer: XLA input projection + pallas recurrence.

    Drop-in for the `lax.scan(gru_cell)` loop in `RNNSpec.apply`:
    x (T, B, in), h0 (B, H) -> (y (T, B, H), hT (B, H)).
    """
    if compute_dtype == "bfloat16":
        gi = jax.lax.dot_general(
            x.astype(jnp.bfloat16),
            params["w_ih"].astype(jnp.bfloat16),
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + params["b_ih"]
    else:
        gi = x @ params["w_ih"] + params["b_ih"]
    return fused_gru_sequence(gi, params["w_hh"], params["b_hh"], h0, interpret)
