"""Round-4 GRU kernel lab: candidate fused-recurrence redesigns, validated
against the scan path and timed in isolation (recurrence ONLY — the XLA
input projection is identical for all paths and previously diluted the
microbench, BASELINE.md round-3 "fused GRU" section).

Candidates (VERDICT r3 item 4: tile/pipeline the backward, widen the win
envelope beyond one batch tile):

- v1: the shipped kernel (`ops/fused_gru.fused_gru_sequence`) — grid
  (batch-tile, T), batch-tile-outer, carry in scratch; loses when the
  backward needs >1 batch tile (serial chain lengthens nb x).
- v2: time-outer interleaved grid (T_chunks, batch_tiles) with ALL tile
  carries VMEM-resident: consecutive grid steps touch different tiles, so
  the carry dependency sits nb steps apart and the MXU/VPU pipeline is not
  stalled on it; K timesteps unrolled per grid step amortise fixed
  per-step overhead.

Usage:
    JAX_PLATFORMS=cpu python scripts/diag/gru_kernel_lab.py --check   # interpret-mode parity
    python scripts/diag/gru_kernel_lab.py --bench                     # TPU timings
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from codebase_tpu.ops.fused_gru import _gates, _pad_batch, fused_gru_sequence

_VMEM_BUDGET = 10 * 1024 * 1024


# --------------------------------------------------------------------- v2

def _v2_tiles(B: int, T: int, H: int, floats_per_b: int, K: int):
    """Pick (Bt, K) for the interleaved grid: the resident carry block costs
    B_pad*H*4 bytes on top of the double-buffered K-timestep stream."""
    # resident: carries (B*H) + weights; streamed per step: K*Bt*floats_per_b
    resident = B * H * 4 + 2 * H * 3 * H * 4
    budget = max(_VMEM_BUDGET - resident, 2 * 1024 * 1024)
    per_row = 2 * floats_per_b * 4 * K  # double-buffered
    tile = max(8, min(B, budget // max(per_row, 1)))
    return max(8, (tile // 8) * 8)


def _fwd_kernel_v2(h0_ref, gi_ref, whh_ref, bhh_ref, y_ref, hcarry_ref, *, K, Bt, T):
    tc = pl.program_id(0)
    b = pl.program_id(1)
    rows = pl.ds(b * Bt, Bt)

    @pl.when(tc == 0)
    def _():
        hcarry_ref[rows] = h0_ref[:]

    h = hcarry_ref[rows]
    whh = whh_ref[:]
    bhh = bhh_ref[:]
    for k in range(K):  # static unroll: K timesteps per grid step
        gh = jnp.dot(h, whh, preferred_element_type=jnp.float32) + bhh
        r, z, n = _gates(gi_ref[k], gh)
        h_new = (1.0 - z) * n + z * h
        # time-padded steps must not advance the carry
        h = jnp.where(tc * K + k < T, h_new, h)
        y_ref[k] = h
    hcarry_ref[rows] = h


def _bwd_kernel_v2(
    gi_ref, whh_ref, bhh_ref, hprev_ref, dy_ref, dhT_ref,
    dgi_ref, dwhh_ref, dbhh_ref, dhcarry_ref, *, K, Bt, T,
):
    tc = pl.program_id(0)
    b = pl.program_id(1)
    rows = pl.ds(b * Bt, Bt)

    @pl.when(tc == 0)
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
    tc_glob = nc - 1 - tc  # reversed-time stream: actual chunk index
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
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dh = jnp.where(valid, dh_new, dh)
        dwhh_acc += jax.lax.dot_general(
            h_prev, dgh,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dbhh_acc += jnp.sum(dgh, axis=0, keepdims=True)
    dwhh_ref[:] += dwhh_acc
    dbhh_ref[:] += dbhh_acc
    dhcarry_ref[rows] = dh


def _pad_time(x, T_pad):
    if x.shape[0] == T_pad:
        return x
    pad = [(0, 0)] * x.ndim
    pad[0] = (0, T_pad - x.shape[0])
    return jnp.pad(x, pad)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_gru_v2(gi, w_hh, b_hh, h0, K=4, interpret=False):
    y, hT = _v2_fwd_impl(gi, w_hh, b_hh, h0, K, interpret)
    return y, hT


def _v2_fwd_impl(gi, w_hh, b_hh, h0, K, interpret):
    T, B, H3 = gi.shape
    H = H3 // 3
    K = max(1, min(K, T))
    Bt = _v2_tiles(B, T, H, 4 * H, K)
    B_pad = -(-B // Bt) * Bt
    T_pad = -(-T // K) * K
    grid = (T_pad // K, B_pad // Bt)
    f32 = jnp.float32

    gi_p = _pad_time(_pad_batch(gi, B_pad, 1), T_pad)
    h0_p = _pad_batch(h0, B_pad, 0)

    y, hT = pl.pallas_call(
        functools.partial(_fwd_kernel_v2, K=K, Bt=Bt, T=T),
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


def _v2_fwd(gi, w_hh, b_hh, h0, K, interpret):
    y, hT = _v2_fwd_impl(gi, w_hh, b_hh, h0, K, interpret)
    return (y, hT), (gi, w_hh, b_hh, h0, y)


def _v2_bwd(K, interpret, residuals, cotangents):
    gi, w_hh, b_hh, h0, y = residuals
    dy, dhT = cotangents
    T, B, H3 = gi.shape
    H = H3 // 3
    K = max(1, min(K, T))
    Bt = _v2_tiles(B, T, H, 8 * H, K)
    B_pad = -(-B // Bt) * Bt
    T_pad = -(-T // K) * K
    grid = (T_pad // K, B_pad // Bt)
    f32 = jnp.float32

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
    rev = lambda tc, b: (nc - 1 - tc, b, 0)  # noqa: E731
    dgi, dwhh, dbhh, dh0 = pl.pallas_call(
        functools.partial(_bwd_kernel_v2, K=K, Bt=Bt, T=T),
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
            pl.BlockSpec((H, H3), lambda tc, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H3), lambda tc, b: (0, 0), memory_space=pltpu.VMEM),
            # resident carry-store output (see forward)
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


fused_gru_v2.defvjp(_v2_fwd, _v2_bwd)


# ------------------------------------------------------------------ checks

def scan_ref(gi, w_hh, b_hh, h0):
    def step(h, gi_t):
        gh = h @ w_hh + b_hh
        H = h.shape[-1]
        r = jax.nn.sigmoid(gi_t[:, :H] + gh[:, :H])
        z = jax.nn.sigmoid(gi_t[:, H : 2 * H] + gh[:, H : 2 * H])
        n = jnp.tanh(gi_t[:, 2 * H :] + r * gh[:, 2 * H :])
        hn = (1.0 - z) * n + z * h
        return hn, hn

    hT, y = jax.lax.scan(step, h0, gi)
    return y, hT


def check(K_list=(1, 2, 4, 5)):
    key = jax.random.PRNGKey(0)
    T, B, H = 7, 24, 128
    ks = jax.random.split(key, 5)
    gi = jax.random.normal(ks[0], (T, B, 3 * H))
    w_hh = jax.random.normal(ks[1], (H, 3 * H)) * 0.2
    b_hh = jax.random.normal(ks[2], (3 * H,)) * 0.1
    h0 = jax.random.normal(ks[3], (B, H))

    def loss(fn):
        def f(gi, w_hh, b_hh, h0):
            y, hT = fn(gi, w_hh, b_hh, h0)
            return jnp.sum(y**2) + jnp.sum(hT * hT[::-1])

        return f

    ref_val = loss(scan_ref)(gi, w_hh, b_hh, h0)
    ref_grads = jax.grad(loss(scan_ref), argnums=(0, 1, 2, 3))(gi, w_hh, b_hh, h0)
    for K in K_list:
        fn = lambda *a: fused_gru_v2(*a, K, True)  # noqa: E731
        val = loss(fn)(gi, w_hh, b_hh, h0)
        grads = jax.grad(loss(fn), argnums=(0, 1, 2, 3))(gi, w_hh, b_hh, h0)
        ok_v = bool(jnp.allclose(val, ref_val, rtol=1e-5, atol=1e-5))
        ok_g = all(
            bool(jnp.allclose(a, b, rtol=1e-4, atol=1e-4))
            for a, b in zip(grads, ref_grads)
        )
        err = max(
            float(jnp.max(jnp.abs(a - b))) for a, b in zip(grads, ref_grads)
        )
        print(f"K={K}: value_ok={ok_v} grads_ok={ok_g} max_grad_err={err:.2e}")
        assert ok_v and ok_g, f"v2 parity FAILED at K={K}"
    print("v2 parity OK")


# ------------------------------------------------------------------- bench

def _sync(tree):
    leaf = jax.tree.leaves(tree)[0]
    jax.device_get(leaf.ravel()[0])  # device_get is the reliable axon sync


def bench_one(name, fn, args, grad=True, reps=20):
    f = jax.jit(jax.grad(fn, argnums=(0, 1)) if grad else fn)
    out = f(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    _sync(out)
    return (time.perf_counter() - t0) / reps


def bench(shapes, Ks=(1, 2, 5), reps=20):
    H = 128
    for T, B in shapes:
        ks = jax.random.split(jax.random.PRNGKey(0), 4)
        gi = jax.random.normal(ks[0], (T, B, 3 * H))
        w_hh = jax.random.normal(ks[1], (H, 3 * H)) * 0.2
        b_hh = jnp.zeros((3 * H,))
        h0 = jnp.zeros((B, H))
        args = (gi, w_hh)

        def mk(fn):
            def f(gi, w_hh):
                y, hT = fn(gi, w_hh, b_hh, h0)
                return jnp.sum(y**2) + jnp.sum(hT**2)

            return f

        row = {"T": T, "B": B, "H": H}
        for grad, tag in ((False, "fwd"), (True, "bptt")):
            row[f"scan_{tag}_ms"] = round(
                bench_one("scan", mk(scan_ref), args, grad, reps) * 1e3, 3
            )
            row[f"v1_{tag}_ms"] = round(
                bench_one(
                    "v1", mk(lambda *a: fused_gru_sequence(*a, False)), args, grad, reps
                )
                * 1e3,
                3,
            )
            for K in Ks:
                row[f"v2k{K}_{tag}_ms"] = round(
                    bench_one(
                        f"v2k{K}",
                        mk(lambda *a, K=K: fused_gru_v2(*a, K, False)),
                        args,
                        grad,
                        reps,
                    )
                    * 1e3,
                    3,
                )
        print(json.dumps(row), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--bench", action="store_true")
    ap.add_argument("--shapes", default="25x512,25x1024,25x2048,25x4096,25x8192")
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()
    if args.check:
        check()
    if args.bench:
        shapes = [tuple(int(v) for v in s.split("x")) for s in args.shapes.split(",")]
        bench(shapes, reps=args.reps)


if __name__ == "__main__":
    main()
