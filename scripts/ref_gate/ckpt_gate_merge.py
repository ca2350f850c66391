"""Merge round-3 and round-4 checkpoint-gate values into the 10-seed
verdict VERDICT r3 item 2 asks for, with the paired-sign analysis made
explicit (round 3: all 5 pairs favored the reference, sign-test p~0.03 —
'eval noise' was not a complete explanation; this either dissolves or
confirms that signal at n=10).

Inputs: docs/gate_evidence/CKPT_GATE_r3.json (seeds 0-4, recorded values)
plus a round-4 ckpt_gate.py JSON for seeds 5-9 (same evaluator, same
episode count). Seeds are paired by INDEX (fw seed i vs ref seed i) — the
same pairing the round-3 analysis used; the pairing is arbitrary (separate
RNG streams), so the sign test treats it as 10 independent (fw, ref) draws
compared pairwise.

Usage:
  python scripts/ref_gate/ckpt_gate_merge.py \
      --r3 docs/gate_evidence/CKPT_GATE_r3.json --r4 /tmp/ckpt_gate_r4.json \
      [--out docs/gate_evidence/CKPT_GATE_r4.json]
"""

from __future__ import annotations

import argparse
import json
import math
from pathlib import Path


def _mean_std(xs):
    m = sum(xs) / len(xs)
    var = sum((x - m) ** 2 for x in xs) / max(len(xs) - 1, 1)
    return m, math.sqrt(var)


def sign_test_p(fw, ref):
    """Two-sided exact binomial sign test on paired (fw - ref) signs."""
    wins = sum(1 for a, b in zip(fw, ref) if a > b)
    n = sum(1 for a, b in zip(fw, ref) if a != b)
    if n == 0:
        return 1.0
    # P(X <= min(wins, n-wins)) * 2 under Binomial(n, 0.5)
    k = min(wins, n - wins)
    tail = sum(math.comb(n, i) for i in range(k + 1)) / 2**n
    return min(1.0, 2 * tail)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--r3", type=Path, required=True)
    ap.add_argument("--r4", type=Path, required=True)
    ap.add_argument("--out", type=Path, default=None)
    args = ap.parse_args()

    r3 = json.loads(args.r3.read_text())
    r4 = json.loads(args.r4.read_text())
    assert r3["episodes_per_policy"] == r4["episodes_per_policy"], (
        "merged gates must use the same evaluator precision"
    )
    fw = list(r3["fw_values"]) + list(r4["fw_values"])
    ref = list(r3["ref_values"]) + list(r4["ref_values"])
    fw_m, fw_s = _mean_std(fw)
    ref_m, ref_s = _mean_std(ref)
    delta = fw_m - ref_m
    out = {
        "episodes_per_policy": r3["episodes_per_policy"],
        "n_seeds": len(fw),
        "fw_values": [round(v, 4) for v in fw],
        "ref_values": [round(v, 4) for v in ref],
        "fw_mean": round(fw_m, 4),
        "fw_std": round(fw_s, 4),
        "ref_mean": round(ref_m, 4),
        "ref_std": round(ref_s, 4),
        "delta": round(delta, 4),
        "strict_band": round(2 * ref_s, 4),
        "strict_pass": abs(delta) <= 2 * ref_s,
        "fw_wins": sum(1 for a, b in zip(fw, ref) if a > b),
        "sign_test_p_two_sided": round(sign_test_p(fw, ref), 4),
        "sources": {"r3": str(args.r3), "r4": str(args.r4)},
    }
    print(json.dumps(out), flush=True)
    if args.out:
        args.out.write_text(json.dumps(out, indent=1) + "\n")


if __name__ == "__main__":
    main()
