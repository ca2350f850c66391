"""The vendored learning-gate evidence must keep reproducing its verdict.

Two generations of evidence, both on Foraging-8x8-2p-3f-v3 T=25, 2M steps,
reference-default hyperparameters, identical JAX env dynamics on both sides:

- round 2 (`ref/`, `fw/`): 3 seeds/side; the IDQN verdict passed only via a
  0.1 absolute slack band — kept as the historical record.
- round 3 (`ref_r3/`, `fw_r3/`, `CKPT_GATE_r3.json`): 5 seeds/side, judged
  STRICT (|fw_mean - ref_mean| <= 2*ref_std, no slack) after closing the
  replay slot-reuse quirk (`ops/replay.py`) and proving update-chain
  exactness in f64 (`scripts/diag/update_parity.py`). Passes both ways:
  results.csv tails AND final-checkpoint policy values over 2000 eval
  episodes per seed (`scripts/ref_gate/ckpt_gate.py`).

This test re-runs the comparison logic over the vendored CSVs/JSON so a
regression in `compare_gate.py` — or an accidental edit to the evidence —
fails loudly.
"""

import json
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
EVIDENCE = REPO / "docs" / "gate_evidence"

sys.path.insert(0, str(REPO / "scripts" / "ref_gate"))
import compare_gate  # noqa: E402


def _load(subdir, algo):
    return {
        int(p.stem.split("seed")[1]): compare_gate._read_csv(p)
        for p in sorted((EVIDENCE / subdir).glob(f"{algo}_seed*.csv"))
    }


class TestRound3Strict:
    def test_idqn_csv_gate_passes_strict(self):
        ref = _load("ref_r3", "idqn")
        fw = _load("fw_r3", "idqn")
        assert len(ref) == 5 and len(fw) == 5, "5 seeds per side"
        result = compare_gate.compare("idqn", ref, fw, tail=5, abs_slack=0.0)
        assert result["within_seed_variance"], result
        assert result["band_overlap"], result
        assert abs(result["ref_mean"] - 0.6105) < 0.01, result
        assert abs(result["fw_mean"] - 0.5786) < 0.01, result

    def test_idqn_checkpoint_gate_passes_strict(self):
        data = json.loads((EVIDENCE / "CKPT_GATE_r3.json").read_text())
        assert data["episodes_per_policy"] >= 2000
        assert len(data["fw_values"]) == 5 and len(data["ref_values"]) == 5
        assert data["strict_pass"], data
        # re-derive the verdict from the vendored per-seed values
        import statistics as st

        fm, rm = st.mean(data["fw_values"]), st.mean(data["ref_values"])
        rs = st.stdev(data["ref_values"])
        assert abs(fm - rm) <= 2 * rs, data

    def test_ia2c_csv_gate_passes_strict_on_round2_evidence(self):
        """IA2C passed strict already in round 2 (delta 0.023 < 2*0.040)."""
        ref = _load("ref", "ia2c")
        fw = _load("fw", "ia2c")
        assert len(ref) == 3 and len(fw) == 3
        result = compare_gate.compare("ia2c", ref, fw, tail=5, abs_slack=0.0)
        assert result["within_seed_variance"], result


class TestRound2Historical:
    @pytest.mark.parametrize("algo", ["idqn", "ia2c"])
    def test_round2_evidence_reproduces_its_recorded_verdict(self, algo):
        ref = _load("ref", algo)
        fw = _load("fw", algo)
        assert len(ref) == 3 and len(fw) == 3, "3 seeds per side"
        result = compare_gate.compare(algo, ref, fw, tail=5, abs_slack=0.1)
        assert result["within_seed_variance"], result
        expected = {"idqn": (0.626, 0.559), "ia2c": (0.825, 0.802)}[algo]
        assert abs(result["ref_mean"] - expected[0]) < 0.01, result
        assert abs(result["fw_mean"] - expected[1]) < 0.01, result


class TestRound4Strict:
    """Round-4 evidence: the previously-ungated algorithms trained
    head-to-head against the reference's unmodified torch stacks (5
    seeds/side, strict). vdn/qmix ran 1M steps/side (matched budgets — the
    ~1.4k-FPS torch DQN family made 2M x 5 x 2 unaffordable in-round);
    AC-family runs use the full 2M."""

    def _strict(self, algo, n=5, tail=5):
        ref = _load("ref_r4", algo)
        fw = _load("fw_r4", algo)
        assert len(ref) == n and len(fw) == n, f"{n} seeds per side for {algo}"
        result = compare_gate.compare(algo, ref, fw, tail=tail, abs_slack=0.0)
        assert result["within_seed_variance"], result
        return result

    def test_vdn_csv_gate_passes_strict(self):
        result = self._strict("vdn")
        assert abs(result["ref_mean"] - 0.1094) < 0.01, result
        assert abs(result["fw_mean"] - 0.1162) < 0.01, result

    def test_mappo_csv_gate_passes_strict(self):
        result = self._strict("mappo")
        assert abs(result["ref_mean"] - 0.8837) < 0.01, result
        assert abs(result["fw_mean"] - 0.8598) < 0.01, result

    def test_idqn_10_seed_csv_gate_passes_strict(self):
        """VERDICT r3 item 2: 10 seeds/side. r3 seeds 0-4 + r4 seeds 5-9;
        the paired one-sidedness dissolved (fw wins 6/10 curve pairs)."""
        ref = {**_load("ref_r3", "idqn"), **_load("ref_r4", "idqn")}
        fw = {**_load("fw_r3", "idqn"), **_load("fw_r4", "idqn")}
        assert len(ref) == 10 and len(fw) == 10
        result = compare_gate.compare("idqn", ref, fw, tail=5, abs_slack=0.0)
        assert result["within_seed_variance"], result
        assert abs(result["ref_mean"] - result["fw_mean"]) < 0.02, result
        # the r3 alarm was TOTAL one-sidedness (0/5 fw wins on BOTH
        # measurements); at n=10 the csv tails lean ref (2/10, sign test
        # p=0.11, not significant) while the checkpoint gate leans fw
        # (CKPT_GATE_r4.json: delta +0.003, p=0.34) — guard only against
        # full one-sidedness returning
        wins = sum(
            1
            for s in result["fw_final_returns"]
            if result["fw_final_returns"][s] > result["ref_final_returns"][s]
        )
        assert 1 <= wins <= 9, f"csv gate fully one-sided again: fw wins {wins}/10"
        # and the delta must stay well inside the strict band (r3: 95% of
        # band consumed; now ~20%)
        assert abs(result["ref_mean"] - result["fw_mean"]) <= 0.6 * 2 * result["ref_std"], result

    def test_idqn_10_seed_checkpoint_gate(self):
        data = json.loads((EVIDENCE / "CKPT_GATE_r4.json").read_text())
        assert data["n_seeds"] == 10
        assert data["strict_pass"], data
        # the round-3 'all 5 pairs favor the reference' signal must stay
        # dissolved: two-sided exact sign test not significant
        assert data["sign_test_p_two_sided"] > 0.05, data

    def test_ia2c_5_seed_csv_gate_passes_strict(self):
        """VERDICT r3 item 7: IA2C refreshed to 5 seeds/side strict
        (r2 seeds 0-2 + r4 seeds 3-4)."""
        ref = {**_load("ref", "ia2c"), **_load("ref_r4", "ia2c")}
        fw = {**_load("fw", "ia2c"), **_load("fw_r4", "ia2c")}
        assert len(ref) == 5 and len(fw) == 5
        result = compare_gate.compare("ia2c", ref, fw, tail=5, abs_slack=0.0)
        assert result["within_seed_variance"], result
        assert abs(result["ref_mean"] - 0.8189) < 0.01, result
        assert abs(result["fw_mean"] - 0.8140) < 0.01, result

    def test_qmix_csv_gate_passes_strict_with_reference_clip_scope(self):
        """QMIX passes strict AFTER replicating the reference's critic-only
        grad-clip scope (see COMPARISON.md round-4 'QMIX' section; the
        pre-fix diverging curves are kept in fw_r4_qmix_preclipfix/)."""
        result = self._strict("qmix")
        assert abs(result["ref_mean"] - 0.0315) < 0.005, result
        assert abs(result["fw_mean"] - 0.0268) < 0.005, result

    def test_qmix_prefix_evidence_reproduces_the_divergence(self):
        """The pre-fix record must keep showing the divergence the clip
        scope caused (fw lifts off, ref flat) — it is the diagnosis pin."""
        ref = _load("ref_r4", "qmix")
        fw = _load("fw_r4_qmix_preclipfix", "qmix")
        result = compare_gate.compare("qmix", ref, fw, tail=5, abs_slack=0.0)
        assert not result["within_seed_variance"], result
        assert result["fw_mean"] > result["ref_mean"], result

    def test_maa2c_csv_gate_passes_strict(self):
        result = self._strict("maa2c")
        assert abs(result["ref_mean"] - 0.8650) < 0.01, result
        assert abs(result["fw_mean"] - 0.8290) < 0.01, result

    def test_ippo_csv_gate_passes_strict(self):
        result = self._strict("ippo")
        assert abs(result["ref_mean"] - 0.8592) < 0.01, result
        assert abs(result["fw_mean"] - 0.8162) < 0.01, result


class TestRound5Strict:
    """Round-5 evidence: the gate extended beyond LBF (VERDICT r4 items
    1 and 7). QMIX trained head-to-head on smaclite:3m-v0 (T=60, 1M
    steps/side) — the action-mask training path exercised end-to-end on
    BOTH stacks (reference: info["action_mask"] -> ReplayBuffer -> -1e8
    masking, dqn/model.py:100-113; framework: masked ε-greedy + masked
    target max). IA2C on rware-tiny-2ag-v2 (T=500, 2M steps/side) — the
    second env family; at this budget both stacks are at the earliest
    learning stage (returns ~0.03), so the gate checks agreement at low
    amplitude (documented in COMPARISON.md)."""

    def _strict(self, sub, algo, n=5, tail=5):
        ref = _load(f"ref_r5/{sub}", algo)
        fw = _load(f"fw_r5/{sub}", algo)
        assert len(ref) == n and len(fw) == n, f"{n} seeds per side for {algo}"
        result = compare_gate.compare(algo, ref, fw, tail=tail, abs_slack=0.0)
        assert result["within_seed_variance"], result
        return result

    def test_qmix_smaclite_gate_passes_strict(self):
        result = self._strict("smaclite3m", "qmix")
        assert result["compared_at_step"] >= 950_000
        assert abs(result["ref_mean"] - 2.8922) < 0.02, result
        assert abs(result["fw_mean"] - 2.8813) < 0.02, result
        # real learning signal on this env (vs the 0.03-floor LBF mixers)
        assert result["ref_mean"] > 2.0 and result["fw_mean"] > 2.0

    def test_vdn_smaclite_gate_passes_strict(self):
        result = self._strict("smaclite3m", "vdn")
        assert result["compared_at_step"] >= 950_000
        assert abs(result["ref_mean"] - 2.8569) < 0.02, result
        assert abs(result["fw_mean"] - 2.8884) < 0.02, result
        assert result["fw_mean"] > result["ref_mean"]  # fw ahead

    def test_ia2c_rware_gate_passes_strict(self):
        result = self._strict("rware", "ia2c")
        assert result["compared_at_step"] == 2_000_000
        assert abs(result["ref_mean"] - 0.0400) < 0.01, result
        assert abs(result["fw_mean"] - 0.0280) < 0.01, result


class TestRound5LBFn10:
    """ippo/maa2c extended to 10 seeds/side (VERDICT r4 item 3): round-4
    seeds 0-4 + round-5 seeds 5-9, compared at the largest common step.
    maa2c's round-4 lean dissolves (delta 0.017 ~ 16% of band). ippo passes
    strict at n=10 and the supplementary fw seeds 10-19 (lbf_extra/) put
    the n=20 fw mean at 0.825 vs ref 0.863 — a ~0.9-sigma residual that
    persists while EVERY stage is individually exonerated: f64-bit-faithful
    updates (ppo_update_parity), distributionally identical frozen-policy
    collection (ac_rollout_dist_compare), identical post-done storage
    semantics, and the same measurement channel (both sides log training
    episodes). Full discussion: COMPARISON.md round-5 section."""

    def _n10(self, algo):
        ref = {**_load("ref_r4", algo), **_load("ref_r5/lbf", algo)}
        fw = {**_load("fw_r4", algo), **_load("fw_r5/lbf", algo)}
        assert len(ref) == 10 and len(fw) == 10, algo
        result = compare_gate.compare(algo, ref, fw, tail=5, abs_slack=0.0)
        assert result["within_seed_variance"], result
        return result

    def test_ippo_10_seed_gate_passes_strict(self):
        result = self._n10("ippo")
        assert abs(result["ref_mean"] - 0.8632) < 0.01, result
        assert abs(result["fw_mean"] - 0.8119) < 0.01, result

    def test_maa2c_10_seed_gate_passes_strict(self):
        result = self._n10("maa2c")
        assert abs(result["ref_mean"] - 0.8417) < 0.01, result
        assert abs(result["fw_mean"] - 0.8248) < 0.01, result

    def test_ippo_n20_supplementary_evidence_vendored(self):
        extra = _load("fw_r5/lbf_extra", "ippo")
        assert sorted(extra) == list(range(10, 20))
