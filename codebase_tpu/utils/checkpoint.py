"""Full-state checkpointing with resume.

The reference only saves model weights (`torch.save(model.state_dict())`,
`dqn/train.py:340-343`) and never restores them for training — optimizer,
buffer and RNG state are lost (SURVEY.md §5). Here the complete train-state
pytree (params, target params, optimizer state, replay buffer, running
statistics, RNG key, counters) round-trips, so training resume is exact.

Format: pickle of the numpy-ified pytree. Loading restores jnp arrays with
`jax.tree.map`, optionally validated against a template state's structure.
"""

from __future__ import annotations

import pickle
from pathlib import Path

import jax
import numpy as np


def save_checkpoint(path, state) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    host_state = jax.tree.map(lambda x: np.asarray(x), state)
    with open(path, "wb") as f:
        pickle.dump(host_state, f)


def load_checkpoint(path, template=None):
    with open(path, "rb") as f:
        host_state = pickle.load(f)
    if template is not None:
        t_struct = jax.tree.structure(template)
        s_struct = jax.tree.structure(host_state)
        if t_struct != s_struct:
            raise ValueError(
                f"checkpoint structure mismatch:\n saved: {s_struct}\n expected: {t_struct}"
            )
    import jax.numpy as jnp

    return jax.tree.map(jnp.asarray, host_state)


def latest_checkpoint(ckpt_dir) -> Path:
    """Find the highest-step `model_s{step}.pkl`, mirroring the reference's
    latest-checkpoint discovery (`eval.py:45-52`)."""
    ckpt_dir = Path(ckpt_dir)
    candidates = list(ckpt_dir.glob("model_s*.pkl"))
    if not candidates:
        raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    return max(candidates, key=lambda p: int(p.stem.split("_s")[-1]))
