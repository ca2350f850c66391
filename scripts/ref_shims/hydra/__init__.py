"""Minimal stand-in for `hydra`, used ONLY by the acceptance-gate harness
(`scripts/ref_gate/`) so the reference's unmodified training loops
(`import hydra`; `hydra.utils.instantiate(cfg.model, ...)`) run without
installing Hydra. `instantiate` resolves the reference's `_target_` strings
(e.g. "dqn.model.QNetwork", rooted at the `marlbase` package) and calls the
target with the config's non-underscore keys as kwargs.
"""

from hydra import utils  # noqa: F401
