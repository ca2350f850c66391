"""Environment factory: name string -> wrapped Environment spec.

Reference: `marlbase/utils/envs.py:115-119` (`make_env`) builds a wrapper
stack around `gym.make(name)`; parallelism there means one OS subprocess per
env (`:61-63`). Here the returned object is a pure-function env spec; the
"vectorisation" decision happens at rollout time via `jax.vmap`
(`codebase_tpu/envs/vector.py`), so a single spec serves both the train batch
and single-env evaluation.

Wrapper order matches `utils/envs.py:23-56`: base -> TimeLimit -> [episode
stats via stat_reward] -> ObserveID -> StandardiseReward -> named wrappers.
`clear_info` is accepted and ignored (no info dict to clear).
"""

from __future__ import annotations

import dataclasses
import warnings

from codebase_tpu.envs import wrappers as W
from codebase_tpu.envs.api import Environment
from codebase_tpu.envs.lbforaging import parse_lbf_name


def make_base_env(name: str) -> Environment:
    short = name.split(":")[-1]
    if short.startswith("Foraging"):
        return parse_lbf_name(name)
    if short.startswith("rware"):
        from codebase_tpu.envs.rware import parse_rware_name

        return parse_rware_name(name)
    if "smaclite" in name.lower():
        from codebase_tpu.envs.smaclite import parse_smaclite_name

        return parse_smaclite_name(name)
    if short.startswith("matrix"):
        from codebase_tpu.envs.matrix import parse_matrix_name

        return parse_matrix_name(name)
    raise ValueError(f"Unknown environment name: {name}")


def make_env(
    name: str,
    time_limit: int,
    clear_info: bool = False,
    observe_id: bool = False,
    standardise_rewards: bool = False,
    wrappers=None,
    **kwargs,
) -> Environment:
    del clear_info  # no info dict in the functional API
    env = make_base_env(name)
    if kwargs:
        env = dataclasses.replace(env, **kwargs)
    if time_limit:
        env = W.TimeLimit(env, limit=int(time_limit))
    if observe_id:
        env = W.ObserveID(env)
    if standardise_rewards:
        env = W.StandardiseReward(env)
    reward_standardised = bool(standardise_rewards)
    for wname in wrappers or []:
        if wname not in W.NAMED_WRAPPERS:
            # the reference also falls back to `gym.wrappers` by name
            # (`utils/envs.py:47-54`); the functional API cannot host
            # arbitrary gym wrappers, so map the ones with equivalents and
            # fail loudly (naming the supported set) for the rest
            raise ValueError(
                f"Unknown wrapper {wname!r}. Supported named wrappers: "
                f"{sorted(W.NAMED_WRAPPERS)}. Arbitrary gym.wrappers cannot "
                "be applied to pure-function JAX envs; equivalents are "
                "mapped by name (e.g. gym's NormalizeReward -> "
                "StandardiseReward, RecordEpisodeStatistics/ClearInfo are "
                "always-on/no-op here)."
            )
        cls = W.NAMED_WRAPPERS[wname]
        if cls is W.StandardiseReward:
            if reward_standardised:
                # don't standardise twice: the flag (or an earlier named
                # entry) already applied the transformation
                warnings.warn(
                    f"wrapper {wname!r} skipped: reward standardisation is "
                    "already in the stack (standardise_rewards flag or an "
                    "earlier named wrapper)"
                )
                continue
            if wname == "NormalizeReward":
                # gym's NormalizeReward scales rewards by a running std of
                # the DISCOUNTED RETURN with no mean subtraction — a
                # different transformation from reward standardisation.
                # Configs ported from the reference get the nearest
                # equivalent, not the same reward shaping; say so once.
                warnings.warn(
                    "gym wrapper 'NormalizeReward' is approximated by "
                    "StandardiseReward (streaming mean/std reward "
                    "standardisation). gym's version divides by the running "
                    "std of the discounted return without mean subtraction; "
                    "trained reward magnitudes will differ from the gym "
                    "wrapper's."
                )
            reward_standardised = True
        env = cls(env)
    return env
