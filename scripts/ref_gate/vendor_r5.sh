#!/bin/bash
# Vendor the round-5 gate evidence into docs/gate_evidence/{ref_r5,fw_r5}/
# (subdirs per env family) and print the comparisons. Idempotent.
set -e
cd /root/repo
for d in smaclite3m rware lbf; do
  mkdir -p docs/gate_evidence/ref_r5/$d docs/gate_evidence/fw_r5/$d
done

# reference side: CSVs as produced by run_ref_gate.py
cp -f outputs/ref_gate_r5/smaclite3m/*.csv docs/gate_evidence/ref_r5/smaclite3m/ 2>/dev/null || true
cp -f outputs/ref_gate_r5/rware/*.csv      docs/gate_evidence/ref_r5/rware/      2>/dev/null || true
cp -f outputs/ref_gate_r5/lbf/*.csv        docs/gate_evidence/ref_r5/lbf/        2>/dev/null || true

# framework side: results.csv renamed to the compare_gate convention
vendor_fw () {
  local tag=$1 dest=$2 algo=$3
  for d in outputs/fw_gate_r5/${tag}_seed*; do
    [ -f "$d/results.csv" ] || continue
    local seed=${d##*seed}
    cp -f "$d/results.csv" "docs/gate_evidence/fw_r5/$dest/${algo}_seed${seed}.csv"
  done
}
vendor_fw qmix_smaclite smaclite3m qmix
vendor_fw vdn_smaclite  smaclite3m vdn
vendor_fw ia2c_rware    rware      ia2c
# lbf holds the OFFICIAL n=10 gate seeds (5-9 here + r4's 0-4); the
# supplementary fw-only seeds 10-19 go to lbf_extra
for d in outputs/fw_gate_r5/ippo_seed{5,6,7,8,9}; do
  [ -f "$d/results.csv" ] && cp -f "$d/results.csv" "docs/gate_evidence/fw_r5/lbf/ippo_seed${d##*seed}.csv"
done
mkdir -p docs/gate_evidence/fw_r5/lbf_extra
for d in outputs/fw_gate_r5/ippo_seed1[0-9]; do
  [ -f "$d/results.csv" ] && cp -f "$d/results.csv" "docs/gate_evidence/fw_r5/lbf_extra/ippo_seed${d##*seed}.csv"
done
vendor_fw maa2c         lbf        maa2c

# compare over the vendored flat CSVs (both sides use the ref-style
# {algo}_seed{N}.csv layout; compare_gate's CLI expects fw run dirs, so
# drive the library directly — the same loader test_gate_evidence.py uses)
python - <<'PY'
import sys
sys.path.insert(0, "scripts/ref_gate")
from pathlib import Path
import compare_gate as cg

EV = Path("docs/gate_evidence")

def load(sub, algo):
    return {
        int(p.stem.split("seed")[1]): cg._read_csv(p)
        for p in sorted((EV / sub).glob(f"{algo}_seed*.csv"))
    }

for sub, algos, extra in [
    ("smaclite3m", ["qmix", "vdn"], None),
    ("rware", ["ia2c"], None),
    # lbf: round-5 seeds 5-9 combined with the round-4 5-seed evidence
    ("lbf", ["ippo", "maa2c"], "r4"),
]:
    print(f"== {sub} ==")
    for algo in algos:
        ref = load(f"ref_r5/{sub}", algo)
        fw = load(f"fw_r5/{sub}", algo)
        if extra == "r4":
            ref.update(load("ref_r4", algo))
            fw.update(load("fw_r4", algo))
        if not ref or not fw:
            print(f"  {algo}: INCOMPLETE ({len(ref)} ref / {len(fw)} fw)")
            continue
        r = cg.compare(algo, ref, fw, tail=5, abs_slack=0.0)
        print(
            f"  {algo}: ref {r['ref_mean']:.4f}±{r['ref_std']:.4f} "
            f"(n={len(r['ref_seeds'])}) fw {r['fw_mean']:.4f}±{r['fw_std']:.4f} "
            f"(n={len(r['fw_seeds'])}) @step {r['compared_at_step']} -> "
            f"{'PASS strict' if r['within_seed_variance'] else 'FAIL'}"
        )
PY
