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
- the recurrence runs on a TIME-OUTER interleaved grid `(T_chunks,
  batch_tiles)` (round-4 redesign): every tile's carry stays VMEM-resident
  for the whole call (the hT / dh0 output block doubles as the carry store,
  constant-index so pallas never spills it), consecutive grid steps touch
  DIFFERENT batch tiles — the carry dependency sits `n_tiles` steps apart
  instead of serialising every step — and K timesteps are unrolled per grid
  step to amortise fixed per-step overhead. The round-3 layout (batch-outer
  grid, one tile's whole T before the next) serialised `n_tiles x T` steps
  and collapsed beyond one tile (measured 15.2ms vs scan 6.4ms at T=25
  B=2048 H=128; the interleaved kernel: 3.3ms — 1.9x FASTER than scan);
- the backward is a second streaming kernel (via `jax.custom_vjp`) on the
  same reversed-time interleaved grid, REMATERIALISING the gates from
  `h_{t-1}` (the shifted saved outputs) and `gi_t` instead of saving
  activations — the classic trade of FLOPs for HBM bandwidth. `dw_hh` and
  `db_hh` accumulate in a constant-index output block (TPU grid steps are
  sequential, so the read-modify-write is race-free).

`fused_gru_sequence` is numerically equivalent to scanning
`networks.gru_cell` (same torch gate convention/order) and is exercised
against it — values and grads, including multi-tile and time-padded (T % K
!= 0) shapes — in `tests/test_fused_gru.py` (interpret mode on the CPU
backend; the compiled Mosaic path runs on TPU and is benchmarked by
`scripts/rnn_kernel_bench.py` and `scripts/diag/gru_kernel_lab.py`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM high-water budget (bytes) for picking the batch tile: pallas
# double-buffers every grid-mapped block; the resident carry store
# (B_pad x H) and weights sit on top. Cores have ~16MB.
_VMEM_BUDGET = 10 * 1024 * 1024

# timesteps unrolled per grid step (amortises fixed per-step overhead;
# K=2 measured best across the win envelope — gru_kernel_lab.py)
_K = 2


def _batch_tile(B: int, H: int, floats_per_b: int, K: int) -> int:
    """Largest multiple-of-8 batch tile whose double-buffered K-timestep
    stream fits the budget after the resident carry store and weights.
    `floats_per_b` = f32 elements streamed per batch row per timestep:
    4H forward (gi 3H + y H), 8H backward (+ h_prev, dy, dgi)."""
    resident = B * H * 4 + 2 * H * 3 * H * 4
    budget = max(_VMEM_BUDGET - resident, 2 * 1024 * 1024)
    per_row = 2 * floats_per_b * 4 * K
    tile = max(8, min(B, budget // max(per_row, 1)))
    return max(8, (tile // 8) * 8)


def _gates(gi_t, gh):
    """Torch gate convention: [reset, update, new] along the 3H axis."""
    H = gh.shape[-1] // 3
    r = jax.nn.sigmoid(gi_t[:, :H] + gh[:, :H])
    z = jax.nn.sigmoid(gi_t[:, H : 2 * H] + gh[:, H : 2 * H])
    n = jnp.tanh(gi_t[:, 2 * H :] + r * gh[:, 2 * H :])
    return r, z, n


def _fwd_kernel(h0_ref, gi_ref, whh_ref, bhh_ref, y_ref, hcarry_ref, *, K, Bt, T):
    """One (time-chunk, batch-tile) grid step of the forward recurrence.
    `hcarry_ref` is the (B_pad, H) constant-index output block holding every
    tile's carry in VMEM for the whole call; it IS the returned hT."""
    tc = pl.program_id(0)
    b = pl.program_id(1)
    rows = pl.ds(b * Bt, Bt)

    @pl.when(tc == 0)
    def _():
        hcarry_ref[rows] = h0_ref[:]

    h = hcarry_ref[rows]
    whh = whh_ref[:]
    bhh = bhh_ref[:]
    for k in range(K):  # static unroll
        gh = jnp.dot(h, whh, preferred_element_type=jnp.float32) + bhh
        r, z, n = _gates(gi_ref[k], gh)
        h_new = (1.0 - z) * n + z * h
        # time-padded steps must not advance the carry
        h = jnp.where(tc * K + k < T, h_new, h)
        y_ref[k] = h
    hcarry_ref[rows] = h


def _bwd_kernel(
    gi_ref, whh_ref, bhh_ref, hprev_ref, dy_ref, dhT_ref,
    dgi_ref, dwhh_ref, dbhh_ref, dhcarry_ref, *, K, Bt, T,
):
    """One (reversed-time-chunk, batch-tile) grid step of the backward pass.

    `hprev_ref` streams the SHIFTED saved outputs (h0 || y[:-1]); gates are
    rematerialised from it with one VMEM-resident matmul. `dhcarry_ref` is
    the constant-index (B_pad, H) output block that carries dL/dh between
    chunks and ends as dh0."""
    tc = pl.program_id(0)
    b = pl.program_id(1)
    rows = pl.ds(b * Bt, Bt)

    @pl.when(tc == 0)  # reversed: first grid step is the LAST time chunk
    def _():
        dhcarry_ref[rows] = dhT_ref[:]

    @pl.when(jnp.logical_and(tc == 0, b == 0))
    def _():
        dwhh_ref[:] = jnp.zeros_like(dwhh_ref)
        dbhh_ref[:] = jnp.zeros_like(dbhh_ref)

    whh = whh_ref[:]
    bhh = bhh_ref[:]
    H = whh.shape[0]
    nc = pl.num_programs(0)
    tc_glob = nc - 1 - tc  # actual chunk index under the reversed stream
    dh = dhcarry_ref[rows]
    dwhh_acc = jnp.zeros_like(dwhh_ref)
    dbhh_acc = jnp.zeros_like(dbhh_ref)
    for k in range(K - 1, -1, -1):  # reversed inside the chunk
        valid = tc_glob * K + k < T  # time-padded steps pass dh through
        h_prev = hprev_ref[k]
        gh = jnp.dot(h_prev, whh, preferred_element_type=jnp.float32) + bhh
        gi_t = gi_ref[k]
        r, z, n = _gates(gi_t, gh)
        dh_total = dy_ref[k] + dh
        dn = dh_total * (1.0 - z)
        dz = dh_total * (h_prev - n)
        dpre_n = dn * (1.0 - n * n)
        dr = dpre_n * gh[:, 2 * H :]
        dpre_r = dr * r * (1.0 - r)
        dpre_z = dz * z * (1.0 - z)
        dgh_n = dpre_n * r
        dgh = jnp.where(
            valid, jnp.concatenate([dpre_r, dpre_z, dgh_n], axis=-1), 0.0
        )
        dgi_ref[k] = jnp.concatenate([dpre_r, dpre_z, dpre_n], axis=-1)
        dh_new = dh_total * z + jax.lax.dot_general(
            dgh, whh,
            dimension_numbers=(((1,), (1,)), ((), ())),  # dgh @ whh.T
            preferred_element_type=jnp.float32,
        )
        dh = jnp.where(valid, dh_new, dh)
        dwhh_acc += jax.lax.dot_general(
            h_prev, dgh,
            dimension_numbers=(((0,), (0,)), ((), ())),  # h_prev.T @ dgh
            preferred_element_type=jnp.float32,
        )
        dbhh_acc += jnp.sum(dgh, axis=0, keepdims=True)
    dwhh_ref[:] += dwhh_acc
    dbhh_ref[:] += dbhh_acc
    dhcarry_ref[rows] = dh


def _pad_batch(x, B_pad, axis):
    if x.shape[axis] == B_pad:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, B_pad - x.shape[axis])
    return jnp.pad(x, pad)


def _pad_time(x, T_pad):
    if x.shape[0] == T_pad:
        return x
    pad = [(0, 0)] * x.ndim
    pad[0] = (0, T_pad - x.shape[0])
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
    _check_resident_fits(gi.shape[1], gi.shape[2] // 3)
    y, hT = _fused_gru_fwd_impl(gi, w_hh, b_hh, h0, interpret)
    return y, hT


def _check_resident_fits(B: int, H: int) -> None:
    """Loud eligibility check (mirrors RNNSpec._fused_mode): the (B_pad, H)
    carry store is a constant-index VMEM-resident block, so the WHOLE batch
    must fit alongside the weights — `_batch_tile` only sizes the streamed
    tiles and cannot shrink the carry. Without this check an oversized batch
    (roughly B >= 24k at H=128) fails deep inside Mosaic with no actionable
    error."""
    resident = B * H * 4 + 2 * H * 3 * H * 4
    if resident > _VMEM_BUDGET:
        raise ValueError(
            f"fused GRU kernel cannot hold the batch-wide carry store in "
            f"VMEM: B={B}, H={H} needs {resident / 2**20:.1f}MB resident "
            f"(carry B*H*4 + fwd/bwd recurrent weights) against the "
            f"{_VMEM_BUDGET / 2**20:.0f}MB budget. Use the scan path "
            f"(fused_rnn='off'/'auto') or reduce the update batch."
        )


def _fused_gru_fwd_impl(gi, w_hh, b_hh, h0, interpret):
    T, B, H3 = gi.shape
    H = H3 // 3
    K = max(1, min(_K, T))
    Bt = _batch_tile(B, H, 4 * H, K)
    B_pad = -(-B // Bt) * Bt
    T_pad = -(-T // K) * K
    grid = (T_pad // K, B_pad // Bt)
    f32 = jnp.float32

    gi_p = _pad_time(_pad_batch(gi, B_pad, 1), T_pad)
    h0_p = _pad_batch(h0, B_pad, 0)

    y, hT = pl.pallas_call(
        functools.partial(_fwd_kernel, K=K, Bt=Bt, T=T),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Bt, H), lambda tc, b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, Bt, H3), lambda tc, b: (tc, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H3), lambda tc, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H3), lambda tc, b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((K, Bt, H), lambda tc, b: (tc, b, 0), memory_space=pltpu.VMEM),
            # whole-array constant-index block: VMEM-resident for the whole
            # call (doubles as the per-tile carry store), written out once
            pl.BlockSpec((B_pad, H), lambda tc, b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T_pad, B_pad, H), f32),
            jax.ShapeDtypeStruct((B_pad, H), f32),
        ],
        interpret=interpret,
    )(
        h0_p.astype(f32),
        gi_p.astype(f32),
        w_hh.astype(f32),
        b_hh.reshape(1, H3).astype(f32),
    )
    return y[:T, :B], hT[:B]


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
    K = max(1, min(_K, T))
    Bt = _batch_tile(B, H, 8 * H, K)
    B_pad = -(-B // Bt) * Bt
    T_pad = -(-T // K) * K
    grid = (T_pad // K, B_pad // Bt)
    f32 = jnp.float32

    # shifted outputs: h_prev[t] = y[t-1], h_prev[0] = h0 — lets the kernel
    # stream h_{t-1} as an ordinary time-indexed block
    h_prev = jnp.concatenate([h0[None], y[:-1]], axis=0)
    args = (
        _pad_time(_pad_batch(gi, B_pad, 1), T_pad).astype(f32),
        w_hh.astype(f32),
        b_hh.reshape(1, H3).astype(f32),
        _pad_time(_pad_batch(h_prev, B_pad, 1), T_pad).astype(f32),
        _pad_time(_pad_batch(dy, B_pad, 1), T_pad).astype(f32),
        _pad_batch(dhT, B_pad, 0).astype(f32),
    )
    nc = T_pad // K
    rev = lambda tc, b: (nc - 1 - tc, b, 0)  # noqa: E731 — reversed stream
    dgi, dwhh, dbhh, dh0 = pl.pallas_call(
        functools.partial(_bwd_kernel, K=K, Bt=Bt, T=T),
        grid=grid,
        in_specs=[
            pl.BlockSpec((K, Bt, H3), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H3), lambda tc, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H3), lambda tc, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, Bt, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, Bt, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, H), lambda tc, b: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((K, Bt, H3), rev, memory_space=pltpu.VMEM),
            # dw_hh/db_hh: constant-index accumulators (sequential TPU grid
            # => race-free read-modify-write, resident until call end)
            pl.BlockSpec((H, H3), lambda tc, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H3), lambda tc, b: (0, 0), memory_space=pltpu.VMEM),
            # resident carry-store output (see forward): ends as dh0
            pl.BlockSpec((B_pad, H), lambda tc, b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T_pad, B_pad, H3), f32),
            jax.ShapeDtypeStruct((H, H3), f32),
            jax.ShapeDtypeStruct((1, H3), f32),
            jax.ShapeDtypeStruct((B_pad, H), f32),
        ],
        interpret=interpret,
    )(*args)
    return (
        dgi[:T, :B].astype(gi.dtype),
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
