"""Checkpoint-level learning gate: final-policy values at matched steps.

The results.csv gate inherits heavy eval noise: each row is 100 episodes
(sigma ~ 0.42/sqrt(100) = 0.042), so a 5-row tail still carries sigma ~0.019
per seed — comparable to the effect being measured. This gate removes that
floor: it loads the FINAL checkpoint of every seed from both sides and
scores each policy with the same evaluator over `--episodes` (default 2000,
sigma ~0.009) rollouts at eps=0.05. Harness equivalence was established
separately (scripts/diag/cross_eval.py: fw-vs-ref evaluators agree within
0.01 on identical params in both directions).

Usage:
  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python scripts/ref_gate/ckpt_gate.py \
      --fw 'outputs/fw_gate_final/idqn_seed*/checkpoints' \
      --ref-ckpts outputs/ref_gate_ckpt/checkpoints/model_s2*.pt ... \
      --episodes 2000

Prints per-seed policy values and the strict verdict
(|fw_mean - ref_mean| <= 2*ref_std, no slack).
"""

from __future__ import annotations

import argparse
import json
import math
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO / "scripts" / "diag"))
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fw-ckpts", nargs="+", required=True, help="framework msgpack checkpoints")
    ap.add_argument("--ref-ckpts", nargs="+", required=True, help="reference torch .pt checkpoints")
    ap.add_argument("--episodes", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import cross_eval as ce

    fw_vals, ref_vals = [], []
    for p in args.fw_ckpts:
        m, _ = ce.fw_eval(ce.load_fw_params(p), args.episodes, args.seed)
        fw_vals.append(m)
        print(f"fw  {p}: {m:.4f}", flush=True)
    for p in args.ref_ckpts:
        m, _ = ce.fw_eval(ce.load_ref_params(p), args.episodes, args.seed)
        ref_vals.append(m)
        print(f"ref {p}: {m:.4f}", flush=True)

    def mean_std(xs):
        mu = sum(xs) / len(xs)
        var = sum((x - mu) ** 2 for x in xs) / max(len(xs) - 1, 1)
        return mu, math.sqrt(var)

    fm, fs = mean_std(fw_vals)
    rm, rs = mean_std(ref_vals)
    ok = abs(fm - rm) <= 2 * rs
    print(
        json.dumps(
            {
                "episodes_per_policy": args.episodes,
                "fw_values": [round(v, 4) for v in fw_vals],
                "ref_values": [round(v, 4) for v in ref_vals],
                "fw_mean": round(fm, 4),
                "fw_std": round(fs, 4),
                "ref_mean": round(rm, 4),
                "ref_std": round(rs, 4),
                "delta": round(fm - rm, 4),
                "strict_pass": bool(ok),
            }
        )
    )


if __name__ == "__main__":
    main()
