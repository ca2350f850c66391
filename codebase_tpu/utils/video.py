"""Video recording of policy rollouts.

Reference: `marlbase/utils/video.py` + `record_episodes`
(`dqn/train.py:240-261`, `ac/train.py:122-152`): run the greedy policy on a
single env, collect RGB frames, save a video. Here frames come from the
env spec's host-side `render_frame(state)`; encoding uses imageio (mp4 via
ffmpeg when available, falling back to GIF).
"""

from __future__ import annotations

import logging
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger("codebase_tpu")


class VideoRecorder:
    def __init__(self, fps: int = 10):
        self.fps = fps
        self.frames = []

    def record_frame(self, frame: np.ndarray):
        self.frames.append(np.asarray(frame))

    def save(self, path):
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        try:
            import imageio

            try:
                imageio.mimsave(str(path), self.frames, fps=self.fps)
            except Exception as exc:
                gif = path.with_suffix(".gif")
                log.warning(
                    "mp4 encode failed (%s: %s); falling back to %s",
                    type(exc).__name__,
                    exc,
                    gif,
                )
                imageio.mimsave(str(gif), self.frames, fps=self.fps)
        except ImportError:
            npz = path.with_suffix(".npz")
            log.warning("imageio unavailable; saving raw frames to %s", npz)
            np.savez_compressed(npz, frames=np.stack(self.frames))


def record_episodes(env, policy, n_frames: int, path):
    """Roll the policy on one env instance for `n_frames`, rendering each
    step; episodes auto-restart (`dqn/train.py:240-261`)."""
    recorder = VideoRecorder()
    reset = jax.jit(env.reset)
    step = jax.jit(env.step)
    key = jax.random.PRNGKey(0)

    key, k = jax.random.split(key)
    state, ts = reset(k)
    carry = None
    done = False
    for _ in range(int(n_frames)):
        if done:
            key, k = jax.random.split(key)
            state, ts = reset(k)
            carry = None
            done = False
        recorder.record_frame(env.render_frame(state))
        key, k_act, k_env = jax.random.split(key, 3)
        carry, actions = policy(carry, ts.obs[None], ts.action_mask[None], k_act)
        state, ts = step(state, jnp.asarray(actions)[0], k_env)
        done = bool(ts.done)
    recorder.save(path)
