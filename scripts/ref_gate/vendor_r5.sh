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
vendor_fw ippo          lbf        ippo
vendor_fw maa2c         lbf        maa2c

echo "== smaclite3m =="
python scripts/ref_gate/compare_gate.py \
  --ref docs/gate_evidence/ref_r5/smaclite3m --fw docs/gate_evidence/fw_r5/smaclite3m \
  --algos qmix vdn
echo "== rware =="
python scripts/ref_gate/compare_gate.py \
  --ref docs/gate_evidence/ref_r5/rware --fw docs/gate_evidence/fw_r5/rware \
  --algos ia2c
echo "== lbf (round-5 seeds 5-9 only; combine with r4 for n=10) =="
python scripts/ref_gate/compare_gate.py \
  --ref docs/gate_evidence/ref_r5/lbf --fw docs/gate_evidence/fw_r5/lbf \
  --algos ippo maa2c
