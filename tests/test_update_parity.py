"""The full DQN update chain must be bit-faithful to the reference.

Runs the round-3 gate-diagnosis experiment as a pinned test: identical
params and identical episodic batches through the reference's unmodified
torch `QNetwork.update` (imported in place from /root/reference) and this
framework's loss->grad->clip->Adam->target-update chain, both in float64.
Sequential-update agreement at ~1e-7 relative proves every piece of the
translation (loss semantics, filled masking, double-Q selection, global-norm
clipping, Adam hyperparameters, hard target updates) is exact — so learning
differences can only come from data/eval noise, never the update rule.

Skips when the reference checkout is absent (same policy as the env-parity
tests).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
REFERENCE = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not (REFERENCE / "marlbase" / "dqn" / "model.py").exists(),
    reason="reference checkout not available",
)


def test_f64_update_chain_matches_reference():
    sys.path.insert(0, str(REPO / "scripts" / "ref_shims"))
    sys.path.insert(0, str(REFERENCE))
    sys.path.insert(0, str(REPO / "scripts" / "diag"))

    import jax

    if not jax.config.jax_enable_x64:
        # x64 must be flipped before arrays are created; this test owns it
        jax.config.update("jax_enable_x64", True)
    try:
        import torch

        import update_parity as up

        torch.set_default_dtype(torch.float64)
        rng = np.random.default_rng(0)
        batches = up.make_batches(rng, 60)
        batches = [
            {k: v.astype(np.float64) if v.dtype == np.float32 else v for k, v in b.items()}
            for b in batches
        ]

        from codebase_tpu.models.multi_agent import MultiAgentNetwork

        critic = MultiAgentNetwork.create(
            input_sizes=[up.OBS_DIM] * 2,
            hidden_dims=(128, 128),
            output_sizes=[up.N_ACTIONS] * 2,
            parameter_sharing=False,
        )
        params0 = jax.device_get(
            {
                "critic": jax.tree.map(
                    lambda x: x.astype(np.float64), critic.init(jax.random.PRNGKey(0))
                )
            }
        )
        fw_losses, fw_params = up.run_framework(params0, batches)
        ref_losses, ref_params = up.run_reference(params0, batches)

        rel = np.abs(fw_losses - ref_losses) / np.maximum(np.abs(ref_losses), 1e-12)
        assert rel.max() < 1e-6, f"loss divergence {rel.max():.3e} @ {rel.argmax()}"
        for j in range(3):
            dw = np.abs(
                fw_params["critic"]["layers"][j]["w"] - np.stack(ref_params[j]["w"])
            ).max()
            assert dw < 1e-6, f"layer {j} param divergence {dw:.3e}"
    finally:
        jax.config.update("jax_enable_x64", False)
        torch.set_default_dtype(torch.float32)
