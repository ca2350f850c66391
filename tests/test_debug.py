"""Debug mode (SURVEY.md §5 sanitizer story): `debug=true` builds a
checkified train chunk so a NaN in the numeric core raises a LOCATED Python
error instead of silently writing a bad loss row to results.csv."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from codebase_tpu.algos.dqn import build_train_functions
from codebase_tpu.config import load_config
from codebase_tpu.envs.factory import make_env

TOKENS = [
    "+algorithm=idqn",
    "env.parallel_envs=8",
    "algorithm.total_steps=2000",
    "algorithm.training_start=0",
    "algorithm.buffer_size=64",
    "algorithm.batch_size=8",
]


def _build(debug):
    cfg = load_config(TOKENS)
    env = make_env("Foraging-5x5-2p-1f-v3", time_limit=5)
    return build_train_functions(env, env, cfg.algorithm, 5, debug=debug)


def _poison(params):
    """Inject a single NaN into the first weight leaf (a corrupted-update
    stand-in: exactly what a bad lr or div-by-zero produces)."""
    leaves, treedef = jax.tree.flatten(params)
    w = np.array(leaves[0])
    w.flat[0] = np.nan
    leaves[0] = jnp.asarray(w)
    return jax.tree.unflatten(treedef, leaves)


class TestDebugMode:
    def test_nan_injection_raises_located_error(self):
        _, init_state, train_chunk, _ = _build(debug=True)
        state = init_state(jax.random.PRNGKey(0))
        state = state.replace(params=_poison(state.params))
        with pytest.raises(Exception, match="(?i)nan"):
            # poisoned params -> NaN forward -> NaN loss; checkify raises
            # with the producing primitive + source location
            train_chunk(state, 2)

    def test_clean_run_passes_and_matches_default_semantics(self):
        _, init_state, train_chunk, _ = _build(debug=True)
        state = init_state(jax.random.PRNGKey(0))
        state2, metrics = train_chunk(state, 3)
        assert int(jax.device_get(state2.env_steps)) > 0
        assert np.all(np.isfinite(np.asarray(metrics["loss"])))

    def test_debug_off_keeps_nan_sentinel(self):
        # before training_start the non-debug chunk logs loss=NaN (the
        # logger's "no update yet" marker)
        cfg = load_config(TOKENS + ["algorithm.training_start=100000"])
        env = make_env("Foraging-5x5-2p-1f-v3", time_limit=5)
        _, init_state, train_chunk, _ = build_train_functions(
            env, env, cfg.algorithm, 5, debug=False
        )
        state = init_state(jax.random.PRNGKey(0))
        _, metrics = train_chunk(state, 1)
        assert np.all(np.isnan(np.asarray(metrics["loss"])))
