"""Seeds-vs-seeds learning-gate comparison: reference torch algorithms vs
this framework, same env dynamics, same hyperparameters.

Inputs (produced by the two gate harnesses):
- reference side: `outputs/ref_gate/<algo>_seed<s>.csv` from
  `scripts/ref_gate/run_ref_gate.py` (the reference's unmodified
  `marlbase.{dqn,ac}.train` on this framework's JAX envs, torch CPU).
- framework side: `outputs/fw_gate/<algo>_seed<s>/results.csv` from
  `python -m codebase_tpu.run` at the reference-default hyperparameters.

For each algorithm it reports, per seed, the final return (mean of the last
`--tail` eval rows at or below the largest step both sides reached) and a
seeds-vs-seeds verdict. The PASS criterion is strict (round-3, no slack
floor by default): |fw_mean - ref_mean| <= max(2*ref_std, --abs-slack),
with --abs-slack defaulting to 0. A `band_overlap` diagnostic
(|delta| <= 2*ref_std + 2*fw_std) is reported alongside. North star:
BASELINE.json "returns within seed variance of reference" on
Foraging-8x8-2p-3f-v3 T=25.

Usage:
    python scripts/ref_gate/compare_gate.py \
        --ref outputs/ref_gate --fw outputs/fw_gate [--algos idqn ia2c]

Prints a markdown table plus one JSON summary line per algorithm.
"""

from __future__ import annotations

import argparse
import csv
import json
import math
from pathlib import Path


def _read_csv(path: Path):
    with open(path) as f:
        rows = list(csv.DictReader(f))
    out = []
    for r in rows:
        try:
            step = int(float(r["environment_steps"]))
            ret = float(r["mean_episode_returns"])
        except (KeyError, ValueError):
            continue
        if not math.isnan(ret):
            out.append((step, ret))
    return sorted(out)


def _final_return(curve, at_step: int, tail: int):
    eligible = [r for s, r in curve if s <= at_step]
    if not eligible:
        return None
    t = eligible[-tail:]
    return sum(t) / len(t)


def _mean_std(xs):
    m = sum(xs) / len(xs)
    var = sum((x - m) ** 2 for x in xs) / max(len(xs) - 1, 1)
    return m, math.sqrt(var)


def collect(ref_dir: Path, fw_dir: Path, algo: str):
    ref = {
        int(p.stem.split("seed")[1]): _read_csv(p)
        for p in sorted(ref_dir.glob(f"{algo}_seed*.csv"))
    }
    fw = {
        int(p.parent.name.split("seed")[1]): _read_csv(p)
        for p in sorted(fw_dir.glob(f"{algo}_seed*/results.csv"))
    }
    ref = {s: c for s, c in ref.items() if c}
    fw = {s: c for s, c in fw.items() if c}
    return ref, fw


def compare(algo: str, ref: dict, fw: dict, tail: int, abs_slack: float):
    # compare at the largest step EVERY curve reached (partial runs OK)
    at = min(c[-1][0] for c in list(ref.values()) + list(fw.values()))
    ref_f = {s: _final_return(c, at, tail) for s, c in ref.items()}
    fw_f = {s: _final_return(c, at, tail) for s, c in fw.items()}
    rm, rs = _mean_std(list(ref_f.values()))
    fm, fs = _mean_std(list(fw_f.values()))
    # strict: the framework mean must sit within 2 sigma of the REFERENCE
    # seeds (abs_slack, default 0, only widens a degenerate zero-variance band)
    ok = abs(fm - rm) <= max(2 * rs, abs_slack)
    overlap = abs(fm - rm) <= 2 * rs + 2 * fs
    return {
        "algo": algo,
        "compared_at_step": at,
        "ref_seeds": sorted(ref_f),
        "ref_final_returns": {str(s): round(v, 4) for s, v in ref_f.items()},
        "ref_mean": round(rm, 4),
        "ref_std": round(rs, 4),
        "fw_seeds": sorted(fw_f),
        "fw_final_returns": {str(s): round(v, 4) for s, v in fw_f.items()},
        "fw_mean": round(fm, 4),
        "fw_std": round(fs, 4),
        "within_seed_variance": bool(ok),
        "band_overlap": bool(overlap),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", type=Path, default=Path("outputs/ref_gate"))
    ap.add_argument("--fw", type=Path, default=Path("outputs/fw_gate"))
    ap.add_argument("--algos", nargs="+", default=["idqn", "ia2c"])
    ap.add_argument("--tail", type=int, default=5, help="eval rows averaged for the final return")
    ap.add_argument(
        "--abs-slack",
        type=float,
        default=0.0,
        help="minimum half-width of the acceptance band; 0 (default) = the "
        "strict 2*ref_std criterion with no slack floor",
    )
    args = ap.parse_args()

    print(f"| algo | @step | reference mean±std (seeds) | framework mean±std (seeds) | within seed variance |")
    print(f"|------|-------|---------------------------|----------------------------|----------------------|")
    summaries = []
    for algo in args.algos:
        ref, fw = collect(args.ref, args.fw, algo)
        if not ref or not fw:
            print(f"| {algo} | — | {len(ref)} ref curves | {len(fw)} fw curves | INCOMPLETE |")
            continue
        s = compare(algo, ref, fw, args.tail, args.abs_slack)
        summaries.append(s)
        print(
            f"| {algo} | {s['compared_at_step']} "
            f"| {s['ref_mean']:.3f}±{s['ref_std']:.3f} (n={len(s['ref_seeds'])}) "
            f"| {s['fw_mean']:.3f}±{s['fw_std']:.3f} (n={len(s['fw_seeds'])}) "
            f"| {'PASS' if s['within_seed_variance'] else 'FAIL'} |"
        )
    for s in summaries:
        print(json.dumps(s))


if __name__ == "__main__":
    main()
