"""Fused pallas GRU kernel vs lax.scan: BPTT wall-time on the real device.

Measures the DQN-update-shaped workload — forward + full backward through a
GRU layer over whole episodes (`marlbase/utils/models.py:106-116` is one
nn.GRU call over (T, B, feat); our scan path mirrors it, the pallas kernel
fuses it — see `codebase_tpu/ops/fused_gru.py`).

    python scripts/rnn_kernel_bench.py            # on TPU
    JAX_PLATFORMS=cpu python scripts/rnn_kernel_bench.py --interpret  # smoke

Prints one JSON line per (T, B) with both times and the speedup.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp


def bench(T: int, B: int, H: int, interpret: bool, reps: int = 20):
    from codebase_tpu.models.networks import gru_cell, gru_layer_init
    from codebase_tpu.ops.fused_gru import gru_layer_sequence

    params = gru_layer_init(jax.random.PRNGKey(0), H, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (T, B, H), jnp.float32)
    h0 = jnp.zeros((B, H), jnp.float32)

    def scan_loss(params, x):
        def step(h, xt):
            hn = gru_cell(params, xt, h)
            return hn, hn

        hT, y = jax.lax.scan(step, h0, x)
        return jnp.sum(y**2) + jnp.sum(hT**2)

    def fused_loss(params, x):
        y, hT = gru_layer_sequence(params, x, h0, interpret=interpret)
        return jnp.sum(y**2) + jnp.sum(hT**2)

    results = {}
    for name, fn in [("scan", scan_loss), ("fused", fused_loss)]:
        g = jax.jit(jax.grad(fn))
        out = g(params, x)  # compile
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = g(params, x)
        jax.block_until_ready(out)
        results[name] = (time.perf_counter() - t0) / reps
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument(
        "--shapes", default="25x1024,100x512,500x256,25x8192",
        help="comma list of TxB",
    )
    args = ap.parse_args()

    for shape in args.shapes.split(","):
        T, B = (int(v) for v in shape.split("x"))
        r = bench(T, B, args.hidden, args.interpret, reps=3 if args.interpret else 20)
        print(
            json.dumps(
                {
                    "metric": "gru_bptt",
                    "T": T,
                    "B": B,
                    "H": args.hidden,
                    "scan_ms": round(r["scan"] * 1e3, 3),
                    "fused_ms": round(r["fused"] * 1e3, 3),
                    "speedup": round(r["scan"] / r["fused"], 2),
                    "backend": jax.default_backend(),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
