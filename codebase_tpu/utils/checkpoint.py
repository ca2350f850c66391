"""Full-state checkpointing with resume.

The reference only saves model weights (`torch.save(model.state_dict())`,
`dqn/train.py:340-343`) and never restores them for training — optimizer,
buffer and RNG state are lost (SURVEY.md §5). Here the complete train-state
pytree (params, target params, optimizer state, replay buffer, running
statistics, RNG key, counters) round-trips, so training resume is exact.

Format (schema v1): flax msgpack of ``{"meta": {...}, "state": state_dict}``
where ``state_dict`` is `flax.serialization.to_state_dict` of the numpy-ified
pytree. Msgpack is a pure data format — unlike the round-1 pickle format it
cannot execute code on load, is versioned via the meta header, and is
readable without the defining Python classes (orbax-style, SURVEY.md §5).
Loading with a ``template`` restores the exact train-state pytree (and
doubles as a structure guard); loading without one returns the raw nested
dict (enough for the eval CLI, which only needs ``params``).
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

CHECKPOINT_FORMAT = "codebase_tpu-checkpoint"
SCHEMA_VERSION = 1

# magic prefixes of pickle protocol 2+ streams (the unversioned round-1 format)
_PICKLE_MAGIC = b"\x80"


def save_checkpoint(path, state) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    host_state = jax.tree.map(np.asarray, jax.device_get(state))
    payload = {
        "meta": {"format": CHECKPOINT_FORMAT, "version": SCHEMA_VERSION},
        "state": serialization.to_state_dict(host_state),
    }
    blob = serialization.msgpack_serialize(payload)
    tmp = path.with_suffix(path.suffix + ".tmp")
    tmp.write_bytes(blob)  # write-then-rename: no torn checkpoints on crash
    tmp.replace(path)


def load_checkpoint(path, template=None):
    """Load a checkpoint; with a `template` state, restore the full typed
    pytree (raising on any structural mismatch), else return the raw nested
    state dict."""
    blob = Path(path).read_bytes()
    if blob[:1] == _PICKLE_MAGIC:
        raise ValueError(
            f"{path} is an old unversioned pickle checkpoint (round-1 format); "
            "re-save it with the current framework. Refusing to unpickle: "
            "pickle executes arbitrary code on load."
        )
    try:
        payload = serialization.msgpack_restore(blob)
    except Exception as exc:
        raise ValueError(f"{path} is not a {CHECKPOINT_FORMAT} msgpack file: {exc}") from exc
    meta = payload.get("meta") if isinstance(payload, dict) else None
    if not meta or meta.get("format") != CHECKPOINT_FORMAT:
        raise ValueError(f"{path} has no {CHECKPOINT_FORMAT} meta header")
    if int(meta.get("version", -1)) != SCHEMA_VERSION:
        raise ValueError(
            f"{path} has checkpoint schema v{meta.get('version')}; "
            f"this build reads v{SCHEMA_VERSION}"
        )
    state_dict = payload["state"]
    if template is None:
        return state_dict
    try:
        restored = serialization.from_state_dict(template, state_dict)
    except (ValueError, KeyError) as exc:
        raise ValueError(f"checkpoint structure mismatch for {path}: {exc}") from exc
    return jax.tree.map(jnp.asarray, restored)


def resolve_resume(resume, run_dir):
    """Resolve the ``resume`` config value to a checkpoint path (or None).

    ``resume=auto`` discovers the latest checkpoint under
    ``<run_dir>/checkpoints`` and starts fresh when none exists — the
    relaunch-after-preemption path (SURVEY.md §5; pairs with
    `utils/preemption.PreemptionGuard`). Any other truthy value is treated
    as an explicit checkpoint path.
    """
    if not resume:
        return None
    if str(resume) == "auto":
        try:
            return latest_checkpoint(Path(run_dir) / "checkpoints")
        except FileNotFoundError:
            return None
    return Path(resume)


def latest_checkpoint(ckpt_dir) -> Path:
    """Find the highest-step `model_s{step}.*`, mirroring the reference's
    latest-checkpoint discovery (`eval.py:45-52`)."""
    ckpt_dir = Path(ckpt_dir)
    candidates = [p for p in ckpt_dir.glob("model_s*") if not p.name.endswith(".tmp")]
    if not candidates:
        raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    return max(candidates, key=lambda p: int(p.stem.split("_s")[-1]))
