"""Headline benchmark + full suite. Prints exactly ONE JSON line.

Headline metric: IDQN fused-train-loop throughput on Level-Based Foraging
(32768 batched env-axis-last Foraging-8x8-2p-3f envs, on-device episodic
replay, double-Q updates, target maintenance) on one chip — the
BASELINE.json north-star (target: >= 1,000,000 env-steps/s per chip).
`vs_baseline` = value / 1e6.

The `suite` field carries every BASELINE.md tracked config (IDQN/LBF,
IA2C/LBF, VDN+sharing/LBF-10x10, QMIX/RWARE, QMIX/SMAClite-3m, recurrent
IDQN) with env-steps/s, MFU AND HBM-bandwidth utilisation derived from XLA's
compiled cost analysis
(see codebase_tpu/bench_suite.py). The reference publishes no numbers and
has no benchmark suite (`marlbase/utils/loggers.py:69-71` measures FPS at
runtime and records nothing; BASELINE.md).

Timing notes (axon tunnel): windows are timed with jax.block_until_ready on
the full train state; counters are fetched with jax.device_get OUTSIDE the
timed region. Never time through `int(traced_output)` — its first conversion
takes a pathological ~50s path over the tunnel (measured round 3). Best of
three 16-iteration windows absorbs the tunnel latency noise.
"""

from __future__ import annotations

import json
import sys
import traceback


def main():
    from codebase_tpu.utils.compilation_cache import enable as enable_cache

    enable_cache()
    from codebase_tpu import bench_suite

    suite = {}
    for key in bench_suite.CONFIGS:
        try:
            # 5 windows: best-of absorbs the axon tunnel's ±15% per-window
            # latency noise (BASELINE.md "Measurement methodology")
            suite[key] = bench_suite.run_config(key, windows=5)
        except Exception:  # keep the headline alive if one config regresses
            suite[key] = {"error": traceback.format_exc(limit=3).splitlines()[-1]}
            print(f"bench_suite config {key} failed:", file=sys.stderr)
            traceback.print_exc()

    headline = suite.get("idqn_lbf", {})
    value = float(headline.get("env_steps_per_s", 0.0) or 0.0)
    # Field order is load-bearing: the driver records only the LAST 2000
    # characters of this line (BENCH_r04.json truncated the headline away —
    # VERDICT r4 "what's weak" #1). The bulky per-config suite goes FIRST;
    # a compact per-config summary plus the headline fields go LAST so the
    # canonical numbers always survive the tail cut (~700 chars total).
    summary = {
        k: (
            {
                "steps_per_s": round(float(v.get("env_steps_per_s", 0.0)), 0),
                "mfu": round(float(v.get("mfu", 0.0)), 4),
            }
            if "error" not in v
            else {"error": True}
        )
        for k, v in suite.items()
    }
    print(
        json.dumps(
            {
                "suite": suite,
                "summary": summary,
                "metric": "idqn_train_env_steps_per_s",
                "value": round(value, 1),
                "unit": "env-steps/s/chip",
                "vs_baseline": round(value / 1e6, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
