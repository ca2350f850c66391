"""Pallas TPU kernel: a GRU layer fused over the whole time axis.

Why this kernel exists (the BPTT hot path): the reference runs its GRU over a
full `(T, B, feat)` episode in one `nn.GRU` call during every update
(`marlbase/utils/models.py:106-116`; losses BPTT through it,
`dqn/model.py:118-163`). The straightforward TPU translation is
`jax.lax.scan` of a GRU cell (see `models/networks.py:gru_cell`), but XLA
compiles a scan into a sequential while-loop whose body round-trips the
hidden state, the gate activations and the recurrent weights through HBM
every timestep. This kernel runs the entire recurrence in ONE pallas_call:

- the input projection `x @ w_ih + b_ih` stays OUTSIDE the kernel: over the
  folded `(T*B, in)` batch it is one large MXU matmul that XLA already
  schedules at speed-of-light — fusing it would only rebuild XLA;
- the sequential part — `h_t = GRU(gi_t, h_{t-1} @ w_hh + b_hh)` — runs on a
  2-D pallas grid `(batch tiles, T)`: each grid step consumes ONE timestep
  block `(1, Bt, 3H)` streamed from HBM (pallas double-buffers the DMA
  against compute) while the carry `h` and the recurrent weights stay pinned
  in VMEM scratch across the whole call. Streaming one timestep at a time
  keeps the VMEM working set independent of T, so the batch tile — and with
  it the MXU shape of the per-step matmul — stays large (~2048 rows);
- the backward pass is a second streaming kernel (registered via
  `jax.custom_vjp`) that walks the time grid in reverse (via the BlockSpec
  index map) and REMATERIALISES the gates from `h_{t-1}` (the shifted saved
  outputs) and `gi_t` instead of saving activations — the classic trade of
  FLOPs for HBM bandwidth, which is what BPTT on TPU is bound by. `dw_hh`
  and `db_hh` accumulate in a revisited output block (TPU grid steps are
  sequential, so the read-modify-write is race-free).

`fused_gru_sequence` is numerically equivalent to scanning
`networks.gru_cell` (same torch gate convention/order) and is exercised
against it — values and grads — in `tests/test_fused_gru.py` (interpret
mode on the CPU backend; the compiled Mosaic path runs on TPU and is
benchmarked by `scripts/rnn_kernel_bench.py`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM high-water budget for picking the batch tile (bytes). Cores have
# ~16MB of VMEM; pallas DOUBLE-BUFFERS every grid-mapped block (the 2x in
# `_batch_tile`), and the carry/weights scratch sits on top.
_VMEM_BUDGET = 10 * 1024 * 1024


def _batch_tile(B: int, H: int, floats_per_b: int) -> int:
    """Largest multiple-of-8 batch tile whose double-buffered per-timestep
    working set fits the budget. `floats_per_b` = f32 elements streamed per
    batch row per grid step: 4H forward (gi 3H + y H), 8H backward
    (+ dy, dgi)."""
    per_b = 2 * floats_per_b * 4
    tile = max(8, min(B, _VMEM_BUDGET // max(per_b, 1)))
    return max(8, (tile // 8) * 8)


def _gates(gi_t, gh):
    """Torch gate convention: [reset, update, new] along the 3H axis."""
    H = gh.shape[-1] // 3
    r = jax.nn.sigmoid(gi_t[:, :H] + gh[:, :H])
    z = jax.nn.sigmoid(gi_t[:, H : 2 * H] + gh[:, H : 2 * H])
    n = jnp.tanh(gi_t[:, 2 * H :] + r * gh[:, 2 * H :])
    return r, z, n


def _fwd_kernel(gi_ref, whh_ref, bhh_ref, h0_ref, y_ref, hT_ref, h_scr):
    """One (batch-tile, timestep) grid step of the forward recurrence."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:]

    h = h_scr[:]
    gh = jnp.dot(h, whh_ref[:], preferred_element_type=jnp.float32) + bhh_ref[:]
    r, z, n = _gates(gi_ref[0], gh)
    h_new = (1.0 - z) * n + z * h
    y_ref[0] = h_new
    h_scr[:] = h_new

    @pl.when(t == pl.num_programs(1) - 1)
    def _():
        hT_ref[:] = h_new


def _bwd_kernel(
    gi_ref, whh_ref, bhh_ref, hprev_ref, dy_ref, dhT_ref,
    dgi_ref, dwhh_ref, dbhh_ref, dh0_ref, dh_scr,
):
    """One (batch-tile, reversed-timestep) grid step of the backward pass.

    `hprev_ref` streams the SHIFTED saved outputs (h0 ‖ y[:-1]), so
    h_{t-1} for the current global timestep is exactly this block; gates are
    rematerialised from it with one VMEM-resident matmul."""
    b = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)  # reversed: first grid step is the LAST timestep
    def _():
        dh_scr[:] = dhT_ref[:]

    @pl.when(jnp.logical_and(b == 0, t == 0))
    def _():
        dwhh_ref[:] = jnp.zeros_like(dwhh_ref)
        dbhh_ref[:] = jnp.zeros_like(dbhh_ref)

    whh = whh_ref[:]
    h_prev = hprev_ref[0]
    gh = jnp.dot(h_prev, whh, preferred_element_type=jnp.float32) + bhh_ref[:]
    gi_t = gi_ref[0]
    r, z, n = _gates(gi_t, gh)
    H = whh.shape[0]

    dh_total = dy_ref[0] + dh_scr[:]
    dn = dh_total * (1.0 - z)
    dz = dh_total * (h_prev - n)
    dpre_n = dn * (1.0 - n * n)
    dr = dpre_n * gh[:, 2 * H :]
    dpre_r = dr * r * (1.0 - r)
    dpre_z = dz * z * (1.0 - z)
    dgh_n = dpre_n * r
    dgh = jnp.concatenate([dpre_r, dpre_z, dgh_n], axis=-1)
    dgi_ref[0] = jnp.concatenate([dpre_r, dpre_z, dpre_n], axis=-1)

    dh_prev = dh_total * z + jax.lax.dot_general(
        dgh, whh,
        dimension_numbers=(((1,), (1,)), ((), ())),  # dgh @ whh.T
        preferred_element_type=jnp.float32,
    )
    dwhh_ref[:] += jax.lax.dot_general(
        h_prev, dgh,
        dimension_numbers=(((0,), (0,)), ((), ())),  # h_prev.T @ dgh
        preferred_element_type=jnp.float32,
    )
    dbhh_ref[:] += jnp.sum(dgh, axis=0, keepdims=True)
    dh_scr[:] = dh_prev

    @pl.when(t == pl.num_programs(1) - 1)  # reversed: global timestep 0
    def _():
        dh0_ref[:] = dh_prev


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
      interpret: run in pallas interpreter mode (CPU tests). Must be passed
          positionally (custom_vjp nondiff arg).
    Returns:
      (y, hT): layer outputs (T, B, H) and final hidden (B, H).
    Equivalent to `lax.scan(gru_cell)` in `models/networks.py` and
    differentiable via the fused reverse-time kernel (see module docstring).
    """
    y, hT = _fused_gru_fwd_impl(gi, w_hh, b_hh, h0, interpret)
    return y, hT


def _fused_gru_fwd_impl(gi, w_hh, b_hh, h0, interpret):
    T, B, H3 = gi.shape
    H = H3 // 3
    Bt = _batch_tile(B, H, 4 * H)
    B_pad = -(-B // Bt) * Bt
    gi_p = _pad_batch(gi, B_pad, 1)
    h0_p = _pad_batch(h0, B_pad, 0)
    grid = (B_pad // Bt, T)
    f32 = jnp.float32

    y, hT = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Bt, H3), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H3), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H3), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, H), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Bt, H), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, H), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B_pad, H), f32),
            jax.ShapeDtypeStruct((B_pad, H), f32),
        ],
        scratch_shapes=[pltpu.VMEM((Bt, H), f32)],
        interpret=interpret,
    )(
        gi_p.astype(f32),
        w_hh.astype(f32),
        b_hh.reshape(1, H3).astype(f32),
        h0_p.astype(f32),
    )
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
    Bt = _batch_tile(B, H, 8 * H)
    B_pad = -(-B // Bt) * Bt
    grid = (B_pad // Bt, T)
    f32 = jnp.float32

    # shifted outputs: h_prev[t] = y[t-1], h_prev[0] = h0 — lets the kernel
    # stream h_{t-1} as an ordinary time-indexed block
    h_prev = jnp.concatenate([h0[None], y[:-1]], axis=0)

    args = (
        _pad_batch(gi, B_pad, 1).astype(f32),
        w_hh.astype(f32),
        b_hh.reshape(1, H3).astype(f32),
        _pad_batch(h_prev, B_pad, 1).astype(f32),
        _pad_batch(dy, B_pad, 1).astype(f32),
        _pad_batch(dhT, B_pad, 0).astype(f32),
    )
    rev = lambda b, t: (T - 1 - t, b, 0)  # noqa: E731 — reversed-time stream
    dgi, dwhh, dbhh, dh0 = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Bt, H3), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H3), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H3), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bt, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bt, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, H), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Bt, H3), rev, memory_space=pltpu.VMEM),
            # dw_hh/db_hh: every grid step maps to the SAME block and
            # accumulates (sequential TPU grid ⇒ safe read-modify-write)
            pl.BlockSpec((H, H3), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H3), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, H), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B_pad, H3), f32),
            jax.ShapeDtypeStruct((H, H3), f32),
            jax.ShapeDtypeStruct((1, H3), f32),
            jax.ShapeDtypeStruct((B_pad, H), f32),
        ],
        scratch_shapes=[pltpu.VMEM((Bt, H), f32)],
        interpret=interpret,
    )(*args)
    return (
        dgi[:, :B].astype(gi.dtype),
        dwhh.astype(w_hh.dtype),
        dbhh.reshape(H3).astype(b_hh.dtype),
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
