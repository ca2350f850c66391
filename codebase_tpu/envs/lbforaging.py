"""Level-Based Foraging as a pure-JAX environment.

The reference only *wraps* the external `lbforaging` package
(`/root/reference/README.md:71-74`; not vendored there). This module
re-implements the published Level-Based Foraging rules (semitable/lb-foraging,
the env family behind `lbforaging:Foraging-{S}x{S}-{P}p-{F}f[-coop]-v3`) as a
branchless, fully-vectorisable JAX step function. Semantics implemented:

- Grid (rows x cols); P players with levels; up to F foods with levels.
- Actions: NONE=0, NORTH=1, SOUTH=2, WEST=3, EAST=4, LOAD=5.
- Spawning: players uniformly over empty cells, level ~ U{min..max_player_level};
  foods on interior cells with no food in their 8-neighbourhood, level up to
  the sum of the three lowest player levels (exclusive upper bound, matching
  numpy Generator.integers), or exactly that sum when `force_coop`.
- Movement: invalid moves (out of bounds / onto food) become NONE; all moves
  resolve simultaneously; any cell claimed by more than one player (movers
  and stayers alike) cancels all claims on it — a single resolution pass,
  reproducing the original's collision dict.
- Loading: each LOADing player adjacent to food selects its first adjacent
  food (N, S, W, E priority); a food is collected when the levels of the
  loaders that selected it sum to >= the food level; each such loader gets
  reward player_level * food_level, normalised by
  (loader_level_sum * total_food_level_spawned) when `normalize_reward`.
  Failed collective loads cost `penalty`. (The original resolves loaders in
  set-pop order, which is order-dependent only when one player is adjacent
  to several foods at once; the first-choice rule here is deterministic and
  agrees in all other cases.)
- Termination: all food collected, or the internal `max_episode_steps`.
  Time-limit truncation is a wrapper concern (the reference applies
  `gym.wrappers.TimeLimit`, `utils/envs.py:41`).

Observations default to the classic flat layout: 3 entries (y, x, level)
per food slot then per player slot, coordinates relative to the agent's
sight-window origin (absolute when sight >= field size), visible entries
compacted to the front in row-major (foods) / index (players) order,
empty slots (-1, -1, 0). `Foraging-grid-*` ids instead emit the original's
grid mode: per agent the flattened (3, 2*sight+1, 2*sight+1) window of
[agent-levels, food-levels, access] layers centred on the agent
(`_make_obs_grid`).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from codebase_tpu.envs.api import Environment, TimeStep

NONE, NORTH, SOUTH, WEST, EAST, LOAD = range(6)
# movement deltas are computed branchlessly from action compares (a table
# gather costs ~130us/step on TPU): dr = (a==SOUTH) - (a==NORTH),
# dc = (a==EAST) - (a==WEST)


@struct.dataclass
class LBFState:
    agent_pos: jnp.ndarray  # (N, 2) int32 (row, col)
    agent_level: jnp.ndarray  # (N,) int32
    food_pos: jnp.ndarray  # (F, 2) int32
    food_level: jnp.ndarray  # (F,) int32
    food_active: jnp.ndarray  # (F,) bool
    food_spawned: jnp.ndarray  # () float32 — total food level at spawn
    t: jnp.ndarray  # () int32


@struct.dataclass
class LBFBatchState:
    """E env instances in struct-of-arrays, env-axis-LAST layout.

    TPU vector lanes are 128 wide along the trailing dim; with the batch
    axis last every elementwise op in the step/obs pipeline runs at full
    lane utilisation instead of ~3/128 (the (E, F)/(E, N, 2) layouts the
    vmapped single-env path produces). See `Environment.reset_batch`.
    """

    agent_r: jnp.ndarray  # (N, E) int32
    agent_c: jnp.ndarray  # (N, E) int32
    agent_level: jnp.ndarray  # (N, E) int32
    food_r: jnp.ndarray  # (F, E) int32
    food_c: jnp.ndarray  # (F, E) int32
    food_level: jnp.ndarray  # (F, E) int32
    food_active: jnp.ndarray  # (F, E) bool
    food_spawned: jnp.ndarray  # (E,) float32
    t: jnp.ndarray  # (E,) int32


@dataclass(frozen=True)
class LevelBasedForaging(Environment):
    rows: int = 8
    cols: int = 8
    num_agents: int = 2
    max_food: int = 3
    sight: int = 8
    max_episode_steps: int = 50
    force_coop: bool = False
    normalize_reward: bool = True
    penalty: float = 0.0
    min_player_level: int = 1
    max_player_level: int = 3
    min_food_level: int = 1
    # grid observations (`Foraging-grid-...` ids): per-agent flattened
    # (3, 2*sight+1, 2*sight+1) window of [agent-levels, food-levels, access]
    # layers, exactly the original package's grid mode (its FlattenObservation
    # wrapper produces the same vector)
    grid_obs: bool = False

    @property
    def n_agents(self) -> int:
        return self.num_agents

    @property
    def obs_dim(self) -> int:
        if self.grid_obs:
            w = 2 * self.sight + 1
            return 3 * w * w
        return 3 * self.max_food + 3 * self.num_agents

    @property
    def n_actions(self) -> int:
        return 6

    @property
    def integer_valued_obs(self) -> bool:
        return True  # coords and levels only -> bf16-exact replay storage

    # ------------------------------------------------------------------ reset

    def reset(self, key):
        state = self._reset_state(key)
        zeros = jnp.zeros((self.num_agents,), jnp.float32)
        ts = TimeStep(
            obs=self._make_obs(state),
            reward=zeros,
            stat_reward=zeros,
            terminated=jnp.asarray(False),
            truncated=jnp.asarray(False),
            action_mask=self.full_ones_mask(),
        )
        return state, ts

    def _reset_state(self, key) -> LBFState:
        k_ppos, k_plvl, k_fpos, k_flvl = jax.random.split(key, 4)
        R, C, N, F = self.rows, self.cols, self.num_agents, self.max_food

        # --- players: sequential uniform over empty cells
        def place_player(occ, k):
            logits = jnp.where(occ, -jnp.inf, 0.0)
            cell = jax.random.categorical(k, logits)
            return occ.at[cell].set(True), cell

        occ0 = jnp.zeros((R * C,), bool)
        player_occ, player_cells = jax.lax.scan(place_player, occ0, jax.random.split(k_ppos, N))
        agent_pos = jnp.stack([player_cells // C, player_cells % C], axis=-1).astype(jnp.int32)
        agent_level = jax.random.randint(
            k_plvl, (N,), self.min_player_level, self.max_player_level + 1, jnp.int32
        )

        # --- foods: interior cells, empty, no food in the 8-neighbourhood
        rr = jnp.arange(R)[:, None]
        cc = jnp.arange(C)[None, :]
        interior = (rr >= 1) & (rr <= R - 2) & (cc >= 1) & (cc <= C - 2)
        player_grid = player_occ.reshape(R, C)

        def place_food(food_grid, k):
            padded = jnp.pad(food_grid.astype(jnp.int32), 1)
            neigh = sum(
                padded[1 + dr : 1 + dr + R, 1 + dc : 1 + dc + C]
                for dr in (-1, 0, 1)
                for dc in (-1, 0, 1)
            )
            valid = interior & ~player_grid & (neigh == 0)
            any_valid = jnp.any(valid)
            logits = jnp.where(valid.reshape(-1), 0.0, -jnp.inf)
            # guard against the all-invalid case (categorical over -inf)
            logits = jnp.where(any_valid, logits, jnp.zeros_like(logits))
            cell = jax.random.categorical(k, logits)
            food_grid = food_grid.at[cell // C, cell % C].set(
                jnp.where(any_valid, True, food_grid[cell // C, cell % C])
            )
            return food_grid, (cell, any_valid)

        food_grid0 = jnp.zeros((R, C), bool)
        _, (food_cells, food_active) = jax.lax.scan(
            place_food, food_grid0, jax.random.split(k_fpos, F)
        )
        food_pos = jnp.stack([food_cells // C, food_cells % C], axis=-1).astype(jnp.int32)

        # food level upper bound: sum of the three lowest player levels
        # (exclusive bound, matching numpy integers); exactly the bound when
        # force_coop
        lvl_sorted = jnp.sort(agent_level)
        max_level = jnp.sum(lvl_sorted[: min(3, N)])
        if self.force_coop:
            food_level = jnp.full((F,), 1, jnp.int32) * max_level
        else:
            hi = jnp.maximum(max_level, self.min_food_level + 1)
            food_level = jax.random.randint(k_flvl, (F,), self.min_food_level, hi, jnp.int32)
        food_level = jnp.where(food_active, food_level, 0)

        return LBFState(
            agent_pos=agent_pos,
            agent_level=agent_level,
            food_pos=food_pos,
            food_level=food_level,
            food_active=food_active,
            food_spawned=jnp.sum(food_level).astype(jnp.float32),
            t=jnp.asarray(0, jnp.int32),
        )

    # ------------------------------------------------------------------- step

    def step(self, state: LBFState, actions, key):
        del key  # dynamics are deterministic given actions
        R, C, N, F = self.rows, self.cols, self.num_agents, self.max_food
        actions = jnp.asarray(actions, jnp.int32)

        food_grid = (
            jnp.zeros((R, C), jnp.int32)
            .at[state.food_pos[:, 0], state.food_pos[:, 1]]
            .add(state.food_level * state.food_active)
        )

        # --- validity: moves must stay in bounds and not enter a food cell
        deltas = jnp.stack(
            [
                (actions == SOUTH).astype(jnp.int32) - (actions == NORTH).astype(jnp.int32),
                (actions == EAST).astype(jnp.int32) - (actions == WEST).astype(jnp.int32),
            ],
            axis=-1,
        )  # (N, 2) — branchless (gather-free) action deltas
        raw_target = state.agent_pos + deltas
        in_bounds = (
            (raw_target[:, 0] >= 0)
            & (raw_target[:, 0] < R)
            & (raw_target[:, 1] >= 0)
            & (raw_target[:, 1] < C)
        )
        clipped = jnp.clip(raw_target, 0, jnp.asarray([R - 1, C - 1]))
        onto_food = food_grid[clipped[:, 0], clipped[:, 1]] > 0
        is_move = (actions >= NORTH) & (actions <= EAST)
        valid_move = is_move & in_bounds & ~onto_food
        target = jnp.where(valid_move[:, None], clipped, state.agent_pos)

        # --- single-pass collision resolution: a cell claimed by >1 player
        # cancels every claim on it (`lbforaging` collision dict semantics)
        target_cell = target[:, 0] * C + target[:, 1]
        claims = jnp.sum(target_cell[None, :] == target_cell[:, None], axis=1)
        new_pos = jnp.where((claims == 1)[:, None], target, state.agent_pos)

        # --- loading: each LOADer picks its first adjacent active food
        # (N, S, W, E priority), foods collect when loader levels suffice
        loading = actions == LOAD
        # adjacency direction of food f relative to agent a:
        diff = state.food_pos[None, :, :] - new_pos[:, None, :]  # (N, F, 2)
        dr, dc = diff[..., 0], diff[..., 1]
        prio = jnp.full((N, F), 99, jnp.int32)
        prio = jnp.where((dr == -1) & (dc == 0), 0, prio)  # food to the north
        prio = jnp.where((dr == 1) & (dc == 0), 1, prio)  # south
        prio = jnp.where((dr == 0) & (dc == -1), 2, prio)  # west
        prio = jnp.where((dr == 0) & (dc == 1), 3, prio)  # east
        prio = jnp.where(state.food_active[None, :] & loading[:, None], prio, 99)
        choice = jnp.argmin(prio, axis=1)  # (N,)
        has_choice = jnp.min(prio, axis=1) < 99
        # loader level sums per food
        picks = has_choice[:, None] & (choice[:, None] == jnp.arange(F)[None, :])  # (N, F)
        loader_sum = jnp.sum(picks * state.agent_level[:, None], axis=0)  # (F,)
        collected = state.food_active & (loader_sum >= state.food_level) & (loader_sum > 0)
        failed = (loader_sum > 0) & ~collected

        # rewards (`lbforaging` ForagingEnv.step loading loop)
        lvl_f = state.food_level.astype(jnp.float32)
        gain = picks * collected[None, :] * state.agent_level[:, None].astype(jnp.float32) * lvl_f[None, :]
        if self.normalize_reward:
            denom = jnp.maximum(loader_sum.astype(jnp.float32) * state.food_spawned, 1e-9)
            gain = gain / denom[None, :]
        reward = jnp.sum(gain, axis=1)
        if self.penalty:
            reward = reward - self.penalty * jnp.sum(picks * failed[None, :], axis=1)

        food_active = state.food_active & ~collected
        t = state.t + 1
        terminated = jnp.logical_or(~jnp.any(food_active), t >= self.max_episode_steps)

        new_state = state.replace(
            agent_pos=new_pos,
            food_active=food_active,
            food_level=jnp.where(food_active, state.food_level, 0),
            t=t,
        )
        ts = TimeStep(
            obs=self._make_obs(new_state),
            reward=reward,
            stat_reward=reward,
            terminated=terminated,
            truncated=jnp.asarray(False),
            action_mask=self.full_ones_mask(),
        )
        return new_state, ts

    # ------------------------------------------------------- batched (E-last)

    @staticmethod
    def to_batch(states: LBFState) -> LBFBatchState:
        """Convert vmapped scalar states (leading E axis) to E-last SoA."""
        return LBFBatchState(
            agent_r=states.agent_pos[..., 0].T,
            agent_c=states.agent_pos[..., 1].T,
            agent_level=states.agent_level.T,
            food_r=states.food_pos[..., 0].T,
            food_c=states.food_pos[..., 1].T,
            food_level=states.food_level.T,
            food_active=states.food_active.T,
            food_spawned=states.food_spawned,
            t=states.t,
        )

    @staticmethod
    def from_batch(state: LBFBatchState) -> LBFState:
        """Inverse of `to_batch` (tests / rendering)."""
        return LBFState(
            agent_pos=jnp.stack([state.agent_r.T, state.agent_c.T], axis=-1),
            agent_level=state.agent_level.T,
            food_pos=jnp.stack([state.food_r.T, state.food_c.T], axis=-1),
            food_level=state.food_level.T,
            food_active=state.food_active.T,
            food_spawned=state.food_spawned,
            t=state.t,
        )

    def reset_batch(self, key, n: int):
        """Bit-identical to `vmap(self.reset)` over `split(key, n)` (pinned
        by tests/test_batched_env.py), but grid logic runs env-axis-last:
        per-env randomness is drawn with the same per-env keys (categorical
        == argmax(logits + gumbel(key)), reproduced explicitly), while the
        occupancy/neighbourhood arithmetic vectorises over full TPU lanes."""
        if self.grid_obs:
            # grid observations have no E-last fast path; the default
            # vmapped single-env path is correct (and grid ids are a
            # fidelity variant, not a throughput target)
            return Environment.reset_batch(self, key, n)
        bstate = self._reset_state_batch(jax.random.split(key, n))
        zeros = jnp.zeros((n, self.num_agents), jnp.float32)
        ts = TimeStep(
            obs=self._make_obs_batch(bstate),
            reward=zeros,
            stat_reward=zeros,
            terminated=jnp.zeros((n,), bool),
            truncated=jnp.zeros((n,), bool),
            action_mask=jnp.broadcast_to(
                self.full_ones_mask(), (n, self.num_agents, self.n_actions)
            ),
        )
        return bstate, ts

    def _reset_state_batch(self, keys) -> LBFBatchState:
        """E-last spawn logic, key-compatible with `vmap(self._reset_state)`:
        every random draw uses the same per-env key stream as the scalar
        path, so results are bit-identical."""
        R, C, N, F = self.rows, self.cols, self.num_agents, self.max_food
        RC = R * C
        E = keys.shape[0]
        k4 = jax.vmap(lambda k: jax.random.split(k, 4))(keys)  # (E, 4, 2)
        kp = jax.vmap(lambda k: jax.random.split(k, N))(k4[:, 0])  # (E, N, 2)
        kf = jax.vmap(lambda k: jax.random.split(k, F))(k4[:, 2])  # (E, F, 2)

        cell_iota = jax.lax.broadcasted_iota(jnp.int32, (RC, E), 0)

        def categorical_cols(logits, step_keys):
            """argmax(logits + gumbel(key)) per column == per-env
            jax.random.categorical(key, logits_e)."""
            g = jax.vmap(lambda k: jax.random.gumbel(k, (RC,)))(step_keys)  # (E, RC)
            return jnp.argmax(logits + g.T, axis=0).astype(jnp.int32)  # (E,)

        # --- players: sequential uniform over empty cells
        occ = jnp.zeros((RC, E), bool)
        player_cells = []
        for i in range(N):
            logits = jnp.where(occ, -jnp.inf, 0.0)
            cell = categorical_cols(logits, kp[:, i])
            player_cells.append(cell)
            occ = occ | (cell_iota == cell[None, :])
        player_cells = jnp.stack(player_cells)  # (N, E)
        agent_r = player_cells // C
        agent_c = player_cells % C
        agent_level = (
            jax.vmap(
                lambda k: jax.random.randint(
                    k, (N,), self.min_player_level, self.max_player_level + 1, jnp.int32
                )
            )(k4[:, 1]).T
        )  # (N, E)

        # --- foods: interior cells, empty, no food in the 8-neighbourhood
        rr = jnp.arange(R)[:, None]
        cc = jnp.arange(C)[None, :]
        interior = ((rr >= 1) & (rr <= R - 2) & (cc >= 1) & (cc <= C - 2))[:, :, None]
        player_grid = occ.reshape(R, C, E)
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (R, C, E), 0)
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (R, C, E), 1)

        food_grid = jnp.zeros((R, C, E), bool)
        food_cells, food_act = [], []
        for j in range(F):
            padded = jnp.pad(food_grid.astype(jnp.int32), ((1, 1), (1, 1), (0, 0)))
            neigh = sum(
                padded[1 + dr : 1 + dr + R, 1 + dc : 1 + dc + C]
                for dr in (-1, 0, 1)
                for dc in (-1, 0, 1)
            )
            valid = interior & ~player_grid & (neigh == 0)
            any_valid = jnp.any(valid, axis=(0, 1))  # (E,)
            logits = jnp.where(valid.reshape(RC, E), 0.0, -jnp.inf)
            logits = jnp.where(any_valid[None, :], logits, jnp.zeros_like(logits))
            cell = categorical_cols(logits, kf[:, j])
            onehot = (row_iota == (cell // C)[None, None, :]) & (
                col_iota == (cell % C)[None, None, :]
            )
            food_grid = food_grid | (onehot & any_valid[None, None, :])
            food_cells.append(cell)
            food_act.append(any_valid)
        food_cells = jnp.stack(food_cells)  # (F, E)
        food_active = jnp.stack(food_act)  # (F, E)

        lvl_sorted = jnp.sort(agent_level, axis=0)  # (N, E)
        max_level = jnp.sum(lvl_sorted[: min(3, N)], axis=0)  # (E,)
        if self.force_coop:
            food_level = jnp.broadcast_to(max_level[None, :], (F, E)).astype(jnp.int32)
        else:
            hi = jnp.maximum(max_level, self.min_food_level + 1)
            food_level = (
                jax.vmap(
                    lambda k, h: jax.random.randint(
                        k, (F,), self.min_food_level, h, jnp.int32
                    )
                )(k4[:, 3], hi).T
            )  # (F, E)
        food_level = jnp.where(food_active, food_level, 0)

        return LBFBatchState(
            agent_r=agent_r.astype(jnp.int32),
            agent_c=agent_c.astype(jnp.int32),
            agent_level=agent_level,
            food_r=(food_cells // C).astype(jnp.int32),
            food_c=(food_cells % C).astype(jnp.int32),
            food_level=food_level,
            food_active=food_active,
            food_spawned=jnp.sum(food_level, axis=0).astype(jnp.float32),
            t=jnp.zeros((E,), jnp.int32),
        )

    def step_batch(self, state: LBFBatchState, actions, key, current_mask=None):
        """E-last batched transition — exactly `vmap(self.step)` semantics
        (validated against it in tests/test_lbforaging.py), written with the
        env axis trailing so every op vectorises over full TPU lanes."""
        del current_mask  # maskless env
        if self.grid_obs:
            return Environment.step_batch(self, state, actions, key)
        del key  # dynamics are deterministic given actions
        R, C, N, F = self.rows, self.cols, self.num_agents, self.max_food
        a = jnp.asarray(actions, jnp.int32).T  # (N, E)
        E = a.shape[1]

        # branchless deltas — a table gather s32[6][(N,E)] costs ~130us/step
        # on TPU, two compares are free
        dr = (a == SOUTH).astype(jnp.int32) - (a == NORTH).astype(jnp.int32)  # (N, E)
        dc = (a == EAST).astype(jnp.int32) - (a == WEST).astype(jnp.int32)
        tr, tc = state.agent_r + dr, state.agent_c + dc
        in_bounds = (tr >= 0) & (tr < R) & (tc >= 0) & (tc < C)
        trc = jnp.clip(tr, 0, R - 1)
        tcc = jnp.clip(tc, 0, C - 1)
        # onto-food: does any active food occupy the target cell
        hit_food = (
            (trc[:, None, :] == state.food_r[None])
            & (tcc[:, None, :] == state.food_c[None])
            & state.food_active[None]
        )  # (N, F, E)
        onto_food = jnp.any(hit_food, axis=1)
        is_move = (a >= NORTH) & (a <= EAST)
        valid_move = is_move & in_bounds & ~onto_food
        ntr = jnp.where(valid_move, trc, state.agent_r)
        ntc = jnp.where(valid_move, tcc, state.agent_c)

        # single-pass collision resolution (see scalar step)
        cell = ntr * C + ntc  # (N, E)
        claims = jnp.sum(cell[:, None, :] == cell[None, :, :], axis=1)  # (N, E)
        ok = claims == 1
        new_r = jnp.where(ok, ntr, state.agent_r)
        new_c = jnp.where(ok, ntc, state.agent_c)

        # loading: first adjacent active food per LOADer (N, S, W, E priority)
        loading = a == LOAD  # (N, E)
        fdr = state.food_r[None] - new_r[:, None, :]  # (N, F, E)
        fdc = state.food_c[None] - new_c[:, None, :]
        prio = jnp.full((N, F, E), 99, jnp.int32)
        prio = jnp.where((fdr == -1) & (fdc == 0), 0, prio)
        prio = jnp.where((fdr == 1) & (fdc == 0), 1, prio)
        prio = jnp.where((fdr == 0) & (fdc == -1), 2, prio)
        prio = jnp.where((fdr == 0) & (fdc == 1), 3, prio)
        prio = jnp.where(state.food_active[None] & loading[:, None, :], prio, 99)
        choice = jnp.argmin(prio, axis=1)  # (N, E)
        has_choice = jnp.min(prio, axis=1) < 99
        slot = jax.lax.broadcasted_iota(jnp.int32, (N, F, E), 1)
        picks = has_choice[:, None, :] & (choice[:, None, :] == slot)  # (N, F, E)
        loader_sum = jnp.sum(picks * state.agent_level[:, None, :], axis=0)  # (F, E)
        collected = state.food_active & (loader_sum >= state.food_level) & (loader_sum > 0)
        failed = (loader_sum > 0) & ~collected

        lvl_f = state.food_level.astype(jnp.float32)  # (F, E)
        gain = (
            picks
            * collected[None]
            * state.agent_level[:, None, :].astype(jnp.float32)
            * lvl_f[None]
        )  # (N, F, E)
        if self.normalize_reward:
            denom = jnp.maximum(
                loader_sum.astype(jnp.float32) * state.food_spawned[None, :], 1e-9
            )
            gain = gain / denom[None]
        reward = jnp.sum(gain, axis=1)  # (N, E)
        if self.penalty:
            reward = reward - self.penalty * jnp.sum(picks * failed[None], axis=1)

        food_active = state.food_active & ~collected
        t = state.t + 1
        terminated = jnp.logical_or(
            ~jnp.any(food_active, axis=0), t >= self.max_episode_steps
        )  # (E,)

        new_state = state.replace(
            agent_r=new_r,
            agent_c=new_c,
            food_active=food_active,
            food_level=jnp.where(food_active, state.food_level, 0),
            t=t,
        )
        ts = TimeStep(
            obs=self._make_obs_batch(new_state),
            reward=reward.T,
            stat_reward=reward.T,
            terminated=terminated,
            truncated=jnp.zeros((E,), bool),
            action_mask=jnp.broadcast_to(
                self.full_ones_mask(), (E, N, self.n_actions)
            ),
        )
        return new_state, ts

    def _make_obs_batch(self, state: LBFBatchState):
        """(E, N, D) observations, computed E-last (see `_make_obs` for the
        layout spec). Sorting uses branchless rank + one-hot permutation —
        the keys are unique by construction, so this matches the scalar
        path's stable argsort exactly."""
        N, F, C = self.num_agents, self.max_food, self.cols
        E = state.agent_r.shape[1]
        BIG = self.rows * self.cols + 10

        origin_r = jnp.maximum(state.agent_r - self.sight, 0)  # (N, E)
        origin_c = jnp.maximum(state.agent_c - self.sight, 0)

        def rank_permute(sort_key, feats):
            """sort_key (N, K, E) with unique keys; feats: list of (N, K, E)
            arrays -> each reordered ascending by key along K."""
            rank = jnp.sum(
                sort_key[:, :, None, :] > sort_key[:, None, :, :], axis=2
            )  # (N, K, E) — position of each element
            K = sort_key.shape[1]
            slot = jax.lax.broadcasted_iota(jnp.int32, (N, K, K, E), 1)
            perm = rank[:, None, :, :] == slot  # (N, K_out, K_in, E)
            return [jnp.sum(perm * f[:, None, :, :], axis=2) for f in feats]

        # --- foods: visible & active, row-major order
        vis_f = (
            state.food_active[None]
            & (jnp.abs(state.food_r[None] - state.agent_r[:, None, :]) <= self.sight)
            & (jnp.abs(state.food_c[None] - state.agent_c[:, None, :]) <= self.sight)
        )  # (N, F, E)
        food_cell = (state.food_r * C + state.food_c)[None]  # (1, F, E)
        fidx = jax.lax.broadcasted_iota(jnp.int32, (N, F, E), 1)
        f_key = jnp.where(vis_f, food_cell, BIG + fidx)
        f_vis, f_r, f_c, f_lvl = rank_permute(
            f_key,
            [
                vis_f.astype(jnp.int32),
                jnp.broadcast_to(state.food_r[None], (N, F, E)) - origin_r[:, None, :],
                jnp.broadcast_to(state.food_c[None], (N, F, E)) - origin_c[:, None, :],
                jnp.broadcast_to(state.food_level[None], (N, F, E)),
            ],
        )
        ok = f_vis > 0
        food_feats = jnp.stack(
            [jnp.where(ok, f_r, -1), jnp.where(ok, f_c, -1), jnp.where(ok, f_lvl, 0)],
            axis=2,
        )  # (N, F, 3, E)

        # --- players: visible, index order
        vis_p = (
            jnp.abs(state.agent_r[None] - state.agent_r[:, None, :]) <= self.sight
        ) & (
            jnp.abs(state.agent_c[None] - state.agent_c[:, None, :]) <= self.sight
        )  # (N, N, E)
        pidx = jax.lax.broadcasted_iota(jnp.int32, (N, N, E), 1)
        p_key = jnp.where(vis_p, pidx, BIG + pidx)
        p_vis, p_r, p_c, p_lvl = rank_permute(
            p_key,
            [
                vis_p.astype(jnp.int32),
                jnp.broadcast_to(state.agent_r[None], (N, N, E)) - origin_r[:, None, :],
                jnp.broadcast_to(state.agent_c[None], (N, N, E)) - origin_c[:, None, :],
                jnp.broadcast_to(state.agent_level[None], (N, N, E)),
            ],
        )
        okp = p_vis > 0
        player_feats = jnp.stack(
            [jnp.where(okp, p_r, -1), jnp.where(okp, p_c, -1), jnp.where(okp, p_lvl, 0)],
            axis=2,
        )  # (N, N, 3, E)

        obs = jnp.concatenate(
            [food_feats.reshape(N, 3 * F, E), player_feats.reshape(N, 3 * N, E)], axis=1
        ).astype(jnp.float32)  # (N, D, E)
        return jnp.transpose(obs, (2, 0, 1))  # (E, N, D)

    # ------------------------------------------------------------ observations

    def _make_obs_grid(self, state: LBFState):
        """Grid observations: (N, 3*(2s+1)^2). Three layers over the field
        padded by `sight` on every side — agent levels, food levels, and an
        access mask (1 on free in-bounds cells, 0 on agents/foods/out of
        bounds) — each agent seeing the (2s+1)-square window centred on
        itself. Layout matches the original lbforaging grid mode flattened
        layer-major (its registered `Foraging-grid-*` ids + the reference's
        FlattenObservation wrapper)."""
        R, C, N, s = self.rows, self.cols, self.num_agents, self.sight
        PR, PC = R + 2 * s, C + 2 * s
        rows = jnp.arange(PR)[None, :, None]  # broadcast (·, PR, ·)
        cols = jnp.arange(PC)[None, None, :]

        a_r = (state.agent_pos[:, 0] + s)[:, None, None]
        a_c = (state.agent_pos[:, 1] + s)[:, None, None]
        a_mask = (rows == a_r) & (cols == a_c)  # (N, PR, PC)
        agent_layer = jnp.sum(
            a_mask * state.agent_level[:, None, None], axis=0
        ).astype(jnp.float32)

        f_r = (state.food_pos[:, 0] + s)[:, None, None]
        f_c = (state.food_pos[:, 1] + s)[:, None, None]
        f_mask = (rows == f_r) & (cols == f_c) & state.food_active[:, None, None]
        food_layer = jnp.sum(
            f_mask * state.food_level[:, None, None], axis=0
        ).astype(jnp.float32)

        interior = (
            (rows[0] >= s) & (rows[0] < s + R) & (cols[0] >= s) & (cols[0] < s + C)
        )
        occupied = a_mask.any(0) | f_mask.any(0)
        access_layer = (interior & ~occupied).astype(jnp.float32)

        layers = jnp.stack([agent_layer, food_layer, access_layer])  # (3,PR,PC)
        w = 2 * s + 1

        def window(pos):
            return jax.lax.dynamic_slice(
                layers, (0, pos[0], pos[1]), (3, w, w)
            ).reshape(-1)

        return jax.vmap(window)(state.agent_pos)

    def _make_obs(self, state: LBFState):
        """(N, 3*max_food + 3*N): food triples then player triples, visible
        entries compacted to the front, empty slots (-1, -1, 0).
        Grid-observation envs (`grid_obs`) use `_make_obs_grid` instead."""
        if self.grid_obs:
            return self._make_obs_grid(state)
        N, F, C = self.num_agents, self.max_food, self.cols
        BIG = self.rows * self.cols + 10

        def one_agent(pos):
            origin = jnp.maximum(pos - self.sight, 0)  # (2,)

            # foods in row-major order among visible & active
            vis_f = (
                state.food_active
                & (jnp.abs(state.food_pos[:, 0] - pos[0]) <= self.sight)
                & (jnp.abs(state.food_pos[:, 1] - pos[1]) <= self.sight)
            )
            sort_key = jnp.where(
                vis_f, state.food_pos[:, 0] * C + state.food_pos[:, 1], BIG + jnp.arange(F)
            )
            order = jnp.argsort(sort_key)
            f_vis = vis_f[order]
            f_pos = state.food_pos[order] - origin[None, :]
            f_lvl = state.food_level[order]
            food_feats = jnp.stack(
                [
                    jnp.where(f_vis, f_pos[:, 0], -1),
                    jnp.where(f_vis, f_pos[:, 1], -1),
                    jnp.where(f_vis, f_lvl, 0),
                ],
                axis=-1,
            )

            # players in index order among visible
            vis_p = (jnp.abs(state.agent_pos[:, 0] - pos[0]) <= self.sight) & (
                jnp.abs(state.agent_pos[:, 1] - pos[1]) <= self.sight
            )
            p_order = jnp.argsort(jnp.where(vis_p, jnp.arange(N), BIG + jnp.arange(N)))
            p_vis = vis_p[p_order]
            p_pos = state.agent_pos[p_order] - origin[None, :]
            p_lvl = state.agent_level[p_order]
            player_feats = jnp.stack(
                [
                    jnp.where(p_vis, p_pos[:, 0], -1),
                    jnp.where(p_vis, p_pos[:, 1], -1),
                    jnp.where(p_vis, p_lvl, 0),
                ],
                axis=-1,
            )
            return jnp.concatenate([food_feats.reshape(-1), player_feats.reshape(-1)]).astype(
                jnp.float32
            )

        return jax.vmap(one_agent)(state.agent_pos)

    # ---------------------------------------------------------------- render

    def render_frame(self, state) -> np.ndarray:
        """Simple RGB rendering: agents blue, food green (brightness ~ level)."""
        cell = 16
        img = np.full((self.rows * cell, self.cols * cell, 3), 30, np.uint8)
        img[::cell, :, :] = 60
        img[:, ::cell, :] = 60
        food_pos = np.asarray(state.food_pos)
        food_lvl = np.asarray(state.food_level)
        active = np.asarray(state.food_active)
        for f in range(self.max_food):
            if active[f]:
                r, c = food_pos[f]
                shade = min(255, 90 + 50 * int(food_lvl[f]))
                img[r * cell + 3 : (r + 1) * cell - 3, c * cell + 3 : (c + 1) * cell - 3] = (
                    0,
                    shade,
                    0,
                )
        pos = np.asarray(state.agent_pos)
        lvl = np.asarray(state.agent_level)
        for a in range(self.num_agents):
            r, c = pos[a]
            shade = min(255, 90 + 50 * int(lvl[a]))
            img[r * cell + 2 : (r + 1) * cell - 2, c * cell + 2 : (c + 1) * cell - 2] = (
                40,
                40,
                shade,
            )
        return img


def parse_lbf_name(name: str) -> LevelBasedForaging:
    """Parse `Foraging[-grid][-{s}s]-{S}x{S}-{P}p-{F}f[-coop][-vK]`
    (optionally prefixed with `lbforaging:`) into an env spec, mirroring the
    registered ids of the lbforaging package the reference relies on
    (README.md:76-87). `-grid` selects grid observations (the original
    registers it immediately after "Foraging"; a trailing `-grid` is also
    accepted)."""
    base = name.split(":")[-1]
    parts = base.split("-")
    assert parts[0] == "Foraging", f"not an lbforaging id: {name}"
    idx = 1
    grid_obs = False
    sight = None
    if parts[idx] == "grid":  # original id position: Foraging-grid-...
        grid_obs = True
        idx += 1
    if parts[idx].endswith("s") and parts[idx][:-1].isdigit():  # partial obs "Foraging-2s-..."
        sight = int(parts[idx][:-1])
        idx += 1
    size = parts[idx].split("x")
    rows, cols = int(size[0]), int(size[1])
    idx += 1
    assert parts[idx].endswith("p")
    players = int(parts[idx][:-1])
    idx += 1
    assert parts[idx].endswith("f")
    foods = int(parts[idx][:-1])
    idx += 1
    coop = "coop" in parts[idx:]
    if "grid" in parts[idx:]:
        grid_obs = True
    return LevelBasedForaging(
        rows=rows,
        cols=cols,
        num_agents=players,
        max_food=foods,
        sight=sight if sight is not None else max(rows, cols),
        force_coop=coop,
        grid_obs=grid_obs,
    )
