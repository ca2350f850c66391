"""The vendored learning-gate evidence must keep reproducing its verdict.

`docs/gate_evidence/` holds the round-2 measured curves: the reference's
unmodified torch algorithms (3 seeds, 2M steps, Foraging-8x8-2p-3f T=25) and
this framework at the same hyperparameters (see BASELINE.md "Learning gate").
This test re-runs the comparison logic over those CSVs so a regression in
`compare_gate.py` — or an accidental edit to the evidence — fails loudly.
"""

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
EVIDENCE = REPO / "docs" / "gate_evidence"

sys.path.insert(0, str(REPO / "scripts" / "ref_gate"))
import compare_gate  # noqa: E402


@pytest.mark.parametrize("algo", ["idqn", "ia2c"])
def test_gate_passes_on_vendored_evidence(algo):
    ref = {
        int(p.stem.split("seed")[1]): compare_gate._read_csv(p)
        for p in sorted(EVIDENCE.glob(f"ref/{algo}_seed*.csv"))
    }
    fw = {
        int(p.stem.split("seed")[1]): compare_gate._read_csv(p)
        for p in sorted(EVIDENCE.glob(f"fw/{algo}_seed*.csv"))
    }
    assert len(ref) == 3 and len(fw) == 3, "3 seeds per side"
    result = compare_gate.compare(algo, ref, fw, tail=5, abs_slack=0.1)
    assert result["within_seed_variance"], result
    # the measured means recorded in BASELINE.md
    expected = {"idqn": (0.626, 0.559), "ia2c": (0.825, 0.802)}[algo]
    assert abs(result["ref_mean"] - expected[0]) < 0.01, result
    assert abs(result["fw_mean"] - expected[1]) < 0.01, result
