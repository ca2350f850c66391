"""Gymnasium-facing adapter for the pure-JAX environments.

The reference consumes environments through the Gymnasium API with the
multi-agent contract "observations/rewards are a tuple/list, one entry per
agent" (`/root/reference/README.md:69`, `marlbase/utils/envs.py`). This
module exposes this framework's functional env specs
(`codebase_tpu/envs/api.py`) behind that exact contract, so any external
Gym-based stack — including the reference's own unmodified training loops —
can drive them. It is also the backbone of the learning-curve acceptance
gate (`scripts/ref_gate/`): the reference's torch algorithms and this
framework's JAX algorithms train on *identical* dynamics.

Two pieces:

- ``GymnasiumEnv``: one env instance. JAX `reset`/`step` are jitted once and
  driven step-by-step from Python; numpy in, numpy out. Honors the
  reference's conventions: tuple observation/action spaces
  (`marlbase/dqn/model.py:32-34` does `flatdim(o) for o in obs_space`),
  per-agent reward list, `info["action_mask"]` when the env masks
  (`marlbase/utils/smaclite_wrapper.py:14-17`), and `unwrapped.n_agents`.

- ``SyncVectorEnv``: a synchronous vector env with the *pre-1.0* Gymnasium
  autoreset semantics the reference was written against
  (`requirements.txt` pins `gymnasium<1.0`): when a sub-env ends, it is
  reset in the same `step` call, the reset observation is returned, and the
  terminal info/observation appear under ``info["final_info"]`` /
  ``info["final_observation"]`` (consumed at `marlbase/ac/train.py:101-110`).
  The installed gymnasium 1.x changed these semantics, so the shim is
  self-contained rather than a subclass.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

try:  # gymnasium is optional for the core framework
    import gymnasium as _gym
    from gymnasium import spaces as _spaces

    _GymEnvBase = _gym.Env
except ImportError:  # pragma: no cover - exercised only without gymnasium
    _gym = None
    _spaces = None
    _GymEnvBase = object


class GymnasiumEnv(_GymEnvBase):
    """Single-instance Gymnasium view of a functional env spec.

    `env` is any `codebase_tpu.envs.api.Environment` (wrappers included —
    e.g. wrap with `envs.wrappers.TimeLimit` to get truncation, exactly
    where the reference applies `gym.wrappers.TimeLimit`,
    `marlbase/utils/envs.py:41`).
    """

    metadata = {"render_modes": ["rgb_array"]}

    def __init__(self, env, seed: Optional[int] = None, render_mode=None):
        if _gym is None:
            raise ImportError("gymnasium is required for GymnasiumEnv")
        self._env = env
        self.n_agents = env.n_agents
        self._obs_dims = tuple(env.obs_dims)
        self.observation_space = _spaces.Tuple(
            [
                _spaces.Box(-np.inf, np.inf, shape=(d,), dtype=np.float32)
                for d in self._obs_dims
            ]
        )
        self.action_space = _spaces.Tuple(
            [_spaces.Discrete(a) for a in env.action_dims]
        )
        self.render_mode = render_mode

        # Fold PRNG-key splitting and output packing into single jitted
        # calls: one dispatch + one device_get per step (a bare
        # jax.random.split per step alone costs ~175us on the CPU backend).
        # The step payload (obs, rewards, flags, mask) is flattened into ONE
        # float32 vector inside jit so the host pays a single device_get per
        # step: per-array transfers cost ~70us each even for scalars on the
        # CPU backend, and there are five of them.
        N = env.n_agents
        D = max(self._obs_dims)
        A = env.n_actions
        with_mask = env.has_action_mask

        def _pack(ts):
            parts = [
                jnp.ravel(ts.obs).astype(jnp.float32),
                ts.reward.astype(jnp.float32),
                ts.terminated.astype(jnp.float32)[None],
                ts.truncated.astype(jnp.float32)[None],
            ]
            if with_mask:
                parts.append(jnp.ravel(ts.action_mask).astype(jnp.float32))
            return jnp.concatenate(parts)

        def _reset(key):
            key, k = jax.random.split(key)
            state, ts = env.reset(k)
            return state, key, _pack(ts)

        def _step(state, key, acts):
            key, k = jax.random.split(key)
            state, ts = env.step(state, acts, k)
            return state, key, _pack(ts)

        self._reset_fn = jax.jit(_reset)
        self._step_fn = jax.jit(_step)
        self._key = jax.random.PRNGKey(0 if seed is None else int(seed))
        self._state = None
        self._N, self._D, self._A, self._with_mask = N, D, A, with_mask

    # -- helpers -----------------------------------------------------------
    def _unpack(self, flat):
        N, D, A = self._N, self._D, self._A
        obs = flat[: N * D].reshape(N, D)
        reward = flat[N * D : N * D + N]
        terminated = bool(flat[N * D + N])
        truncated = bool(flat[N * D + N + 1])
        info = {}
        if self._with_mask:
            info["action_mask"] = flat[N * D + N + 2 :].reshape(N, A)
        return obs, reward, terminated, truncated, info

    def _obs_tuple(self, obs):
        return tuple(obs[i, : self._obs_dims[i]] for i in range(self.n_agents))

    # -- Gymnasium API -------------------------------------------------------
    def reset(self, *, seed: Optional[int] = None, options=None):
        if seed is not None:
            self._key = jax.random.PRNGKey(int(seed))
        self._state, self._key, payload = self._reset_fn(self._key)
        obs, _, _, _, info = self._unpack(np.asarray(payload))
        return self._obs_tuple(obs), info

    def step(self, actions):
        acts = np.asarray(
            [int(a) for a in actions], dtype=np.int32
        )  # accepts list/tuple/np/torch scalars
        if acts.shape != (self.n_agents,):
            raise ValueError(
                f"expected {self.n_agents} actions, got shape {acts.shape}"
            )
        self._state, self._key, payload = self._step_fn(self._state, self._key, acts)
        obs, reward, terminated, truncated, info = self._unpack(np.asarray(payload))
        rewards = [float(r) for r in reward]
        return self._obs_tuple(obs), rewards, terminated, truncated, info

    def render(self):
        return self._env.render_frame(self._state)

    def close(self):
        pass

    @property
    def unwrapped(self):
        return self


class JaxVectorEnv:
    """Vector env that steps all sub-envs in ONE jitted call.

    Same external surface and gym<1.0 semantics as ``SyncVectorEnv`` (see
    below), but the env batch is vmapped inside jit — including same-step
    autoreset — so a vector step costs one XLA dispatch instead of
    ``num_envs``. Episode statistics are accumulated host-side with the
    reference's `RecordEpisodeStatistics` semantics
    (`marlbase/utils/wrappers.py:13-45`): `final_info[j]` carries
    ``episode_returns`` (per-agent float32), ``agent{i}/episode_returns``,
    ``episode_length`` and ``episode_time`` — the keys `squash_info` and the
    AC collector assert on (`marlbase/ac/train.py:101-110`).

    `env` is a functional env spec; wrap it in `envs.wrappers.TimeLimit`
    for truncation, as the reference wraps each sub-env
    (`marlbase/utils/envs.py:41`).
    """

    def __init__(self, env, num_envs: int, seed: Optional[int] = None):
        if _gym is None:
            raise ImportError("gymnasium is required for JaxVectorEnv")
        self._env = env
        self.num_envs = int(num_envs)
        self.n_agents = env.n_agents
        self._obs_dims = tuple(env.obs_dims)
        self.single_observation_space = _spaces.Tuple(
            [
                _spaces.Box(-np.inf, np.inf, shape=(d,), dtype=np.float32)
                for d in self._obs_dims
            ]
        )
        self.single_action_space = _spaces.Tuple(
            [_spaces.Discrete(a) for a in env.action_dims]
        )
        self.observation_space = _spaces.Tuple(
            [
                _spaces.Box(
                    -np.inf, np.inf, shape=(self.num_envs, d), dtype=np.float32
                )
                for d in self._obs_dims
            ]
        )
        self.action_space = _spaces.Tuple(
            [
                _spaces.MultiDiscrete([a] * self.num_envs)
                for a in env.action_dims
            ]
        )

        B = self.num_envs

        def _reset(key):
            key, k = jax.random.split(key)
            state, ts = jax.vmap(env.reset)(jax.random.split(k, B))
            return state, key, (ts.obs, ts.action_mask)

        def _step(state, key, acts):
            key, k_step, k_reset = jax.random.split(key, 3)
            state, ts = jax.vmap(env.step)(
                state, acts, jax.random.split(k_step, B)
            )
            done = ts.done  # (B,)
            # Same-step autoreset: fresh instances for finished envs. All
            # leaves carry a leading env axis (vmap), so a broadcast select
            # is shape-generic across env state pytrees.
            reset_state, reset_ts = jax.vmap(env.reset)(
                jax.random.split(k_reset, B)
            )

            def _sel(new, old):
                d = done.reshape(done.shape + (1,) * (new.ndim - 1))
                return jnp.where(d, new, old)

            state = jax.tree_util.tree_map(_sel, reset_state, state)
            obs_out = _sel(reset_ts.obs, ts.obs)
            mask_out = _sel(reset_ts.action_mask, ts.action_mask)
            payload = (
                obs_out,
                ts.obs,  # pre-reset (final) observation
                ts.reward,
                ts.terminated,
                ts.truncated,
                mask_out,
            )
            return state, key, payload

        self._reset_fn = jax.jit(_reset)
        self._step_fn = jax.jit(_step)
        self._key = jax.random.PRNGKey(0 if seed is None else int(seed))
        self._state = None
        self._ep_ret = np.zeros((B, self.n_agents), np.float32)
        self._ep_len = np.zeros((B,), np.int64)
        self._ep_t0 = np.zeros((B,), np.float64)

    def _obs_tuple(self, obs):
        obs = np.asarray(obs, dtype=np.float32)
        return tuple(
            obs[:, i, : self._obs_dims[i]] for i in range(self.n_agents)
        )

    def _mask_info(self, mask):
        info = {}
        if self._env.has_action_mask:
            info["action_mask"] = np.asarray(mask, dtype=np.float32)
        return info

    def reset(self, *, seed=None, options=None):
        import time as _time

        if seed is not None:
            self._key = jax.random.PRNGKey(int(seed))
        self._state, self._key, payload = self._reset_fn(self._key)
        obs, mask = jax.device_get(payload)
        self._ep_ret[:] = 0.0
        self._ep_len[:] = 0
        self._ep_t0[:] = _time.perf_counter()
        return self._obs_tuple(obs), self._mask_info(mask)

    def step(self, actions):
        import time as _time

        acts = np.asarray(actions, dtype=np.int32)
        if acts.shape == (self.n_agents, self.num_envs):
            acts = acts.T  # agent-major (as the reference AC loop sends)
        if acts.shape != (self.num_envs, self.n_agents):
            raise ValueError(f"bad vector action shape {acts.shape}")
        self._state, self._key, payload = self._step_fn(
            self._state, self._key, acts
        )
        obs, final_obs, reward, terminated, truncated, mask = jax.device_get(
            payload
        )
        reward = np.asarray(reward, dtype=np.float32)
        self._ep_ret += reward
        self._ep_len += 1
        done = np.logical_or(terminated, truncated)
        info = self._mask_info(mask)
        if done.any():
            final_info = [None] * self.num_envs
            final_observation = [None] * self.num_envs
            now = _time.perf_counter()
            fobs = np.asarray(final_obs, dtype=np.float32)
            for j in np.nonzero(done)[0]:
                d = {
                    "episode_returns": self._ep_ret[j].copy(),
                    "episode_length": int(self._ep_len[j]),
                    "episode_time": now - self._ep_t0[j],
                }
                for i in range(self.n_agents):
                    d[f"agent{i}/episode_returns"] = float(self._ep_ret[j, i])
                final_info[j] = d
                final_observation[j] = tuple(
                    fobs[j, i, : self._obs_dims[i]]
                    for i in range(self.n_agents)
                )
                self._ep_ret[j] = 0.0
                self._ep_len[j] = 0
                self._ep_t0[j] = now
            # fill pre-allocated object arrays: np.array(list_of_tuples)
            # would broadcast the tuples into a 2-D array
            fi_arr = np.empty(self.num_envs, dtype=object)
            fo_arr = np.empty(self.num_envs, dtype=object)
            for j in range(self.num_envs):
                fi_arr[j] = final_info[j]
                fo_arr[j] = final_observation[j]
            info["final_info"] = fi_arr
            info["final_observation"] = fo_arr
        return (
            self._obs_tuple(obs),
            reward,
            np.asarray(terminated, dtype=np.bool_),
            np.asarray(truncated, dtype=np.bool_),
            info,
        )

    def close(self):
        pass


class SyncVectorEnv:
    """Synchronous vector env with gymnasium<1.0 autoreset semantics.

    Matches the surface the reference touches on `gym.vector.AsyncVectorEnv`
    (`marlbase/utils/envs.py:61-63`, `marlbase/ac/train.py:30-110`):
    `reset()`; `step(actions)` with actions agent-major (a length-`n_agents`
    sequence of per-env action vectors, as produced by
    `actions.squeeze().tolist()` at `ac/train.py:79`); tuple-of-batched-Box
    `observation_space`; `single_observation_space`/`single_action_space`;
    same-step autoreset with `final_info`/`final_observation`.
    """

    def __init__(self, env_fns: Sequence[Callable[[], object]]):
        if _gym is None:
            raise ImportError("gymnasium is required for SyncVectorEnv")
        self.envs: List[object] = [fn() for fn in env_fns]
        self.num_envs = len(self.envs)
        e0 = self.envs[0]
        self.single_observation_space = e0.observation_space
        self.single_action_space = e0.action_space
        self.observation_space = _spaces.Tuple(
            [
                _spaces.Box(
                    -np.inf, np.inf, shape=(self.num_envs,) + s.shape, dtype=s.dtype
                )
                for s in e0.observation_space
            ]
        )
        self.action_space = _spaces.Tuple(
            [
                _spaces.MultiDiscrete([a.n] * self.num_envs)
                for a in e0.action_space
            ]
        )
        self.n_agents = len(e0.observation_space)

    def _batch_obs(self, per_env_obs):
        # list over envs of tuple over agents -> tuple over agents of (B, d)
        return tuple(
            np.stack([obs[i] for obs in per_env_obs]).astype(np.float32)
            for i in range(self.n_agents)
        )

    def _merge_infos(self, per_env_infos):
        info = {}
        if any("action_mask" in i for i in per_env_infos):
            info["action_mask"] = np.stack(
                [i["action_mask"] for i in per_env_infos]
            ).astype(np.float32)
        return info

    def reset(self, *, seed=None, options=None):
        seeds = (
            [None] * self.num_envs
            if seed is None
            else [int(seed) + i for i in range(self.num_envs)]
        )
        results = [e.reset(seed=s) for e, s in zip(self.envs, seeds)]
        obs = self._batch_obs([r[0] for r in results])
        return obs, self._merge_infos([r[1] for r in results])

    def step(self, actions):
        per_env_actions = list(zip(*actions))  # agent-major -> env-major
        obs_out, rewards, terms, truncs, infos = [], [], [], [], []
        final_info = [None] * self.num_envs
        final_obs = [None] * self.num_envs
        any_done = False
        for j, env in enumerate(self.envs):
            obs, rew, term, trunc, info = env.step(per_env_actions[j])
            if term or trunc:
                any_done = True
                final_info[j] = info
                final_obs[j] = obs
                obs, info = env.reset()
            obs_out.append(obs)
            rewards.append(rew)
            terms.append(term)
            truncs.append(trunc)
            infos.append(info)
        info = self._merge_infos(infos)
        if any_done:
            fi_arr = np.empty(self.num_envs, dtype=object)
            fo_arr = np.empty(self.num_envs, dtype=object)
            for j in range(self.num_envs):
                fi_arr[j] = final_info[j]
                fo_arr[j] = final_obs[j]
            info["final_info"] = fi_arr
            info["final_observation"] = fo_arr
        return (
            self._batch_obs(obs_out),
            np.asarray(rewards, dtype=np.float32),  # (B, n_agents)
            np.asarray(terms, dtype=np.bool_),
            np.asarray(truncs, dtype=np.bool_),
            info,
        )

    def close(self):
        for e in self.envs:
            e.close()
