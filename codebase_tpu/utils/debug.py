"""Debug mode: loud, located NaN/out-of-bounds errors from the jitted core.

SURVEY.md §5 names this the framework's sanitizer story (the reference has
none; JAX's functional model designs races out, and this module covers the
numeric failure class): `debug=true` in the config

- turns on ``jax.config.jax_debug_nans`` (host-level: any jit output
  containing a fresh NaN re-runs un-jitted to locate the producing op), and
- wraps the train chunk in ``jax.experimental.checkify`` float/index/div
  checks, so a NaN loss or an out-of-bounds gather raises a Python error
  naming the failing primitive and source line instead of silently writing
  a bad row to results.csv.

Cost: checkify instruments every primitive and blocks XLA fusions around
the checks — expect several-fold slower steps. Off by default; flip on to
diagnose, not to train.
"""

from __future__ import annotations

import jax


def enable_debug_nans() -> None:
    jax.config.update("jax_debug_nans", True)


def checkify_errors():
    from jax.experimental import checkify

    return checkify.float_checks | checkify.index_checks | checkify.div_checks


def checkify_chunk(chunk_fn):
    """Wrap a (state, iters) train chunk so functional checkify errors are
    raised eagerly on the host after each chunk, with op/source location."""
    from jax.experimental import checkify

    checked = checkify.checkify(chunk_fn, errors=checkify_errors())

    def debug_chunk(state, iters):
        err, out = checked(state, iters)
        checkify.check_error(err)
        return out

    return debug_chunk
