"""SMAC-style cooperative micromanagement combat with action masking.

The reference integrates SMAClite through a thin adapter whose contract is:
integer actions, one scalar team reward broadcast to all agents, and
per-agent `action_mask` in the step info
(`marlbase/utils/smaclite_wrapper.py:10-25`); masks are threaded through
every loss and the exploration policies (`dqn/model.py:100-113`,
`ac/model.py:135-145`). This module provides that whole capability natively:
a vectorisable gridworld micromanagement battle in the SMAC mould —
marine-vs-marine fights with health, attack ranges, cooldowns, a scripted
opponent, shaped team rewards and win bonuses — with exact SMAC-style
action semantics:

- actions: 0 = no-op (only valid when dead), 1 = stop, 2..5 = move N/S/W/E,
  5+j = attack enemy j (valid iff alive, enemy j alive and within range);
- masks: each agent's valid-action vector, exposed via
  `TimeStep.action_mask` with `has_action_mask = True`;
- reward: (damage dealt + 10 per kill + 200 on win) / max_reward, identical
  for every agent (the scalar broadcast of `smaclite_wrapper.py:19-22`);
- termination: one side eliminated or `max_steps`.

Scenario ids: `smaclite:{N}m[_vs_{M}m]-v0` (e.g. `smaclite:5m-v0`,
`smaclite:5m_vs_6m-v0`) — symmetric or asymmetric marine fights.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from codebase_tpu.envs.api import Environment, TimeStep

NOOP, STOP, MOVE_N, MOVE_S, MOVE_W, MOVE_E = range(6)
_MOVE_DELTAS = np.array(
    [[0, 0], [0, 0], [-1, 0], [1, 0], [0, -1], [0, 1]], dtype=np.int32
)


@struct.dataclass
class CombatState:
    ally_pos: jnp.ndarray  # (N, 2) int32
    ally_hp: jnp.ndarray  # (N,) float32
    ally_cd: jnp.ndarray  # (N,) int32 cooldown counters
    enemy_pos: jnp.ndarray  # (M, 2) int32
    enemy_hp: jnp.ndarray  # (M,) float32
    enemy_cd: jnp.ndarray  # (M,) int32
    t: jnp.ndarray  # () int32


@dataclass(frozen=True)
class SmacLiteCombat(Environment):
    n_allies: int = 5
    n_enemies: int = 5
    rows: int = 16
    cols: int = 16
    max_hp: float = 45.0  # marine
    damage: float = 6.0
    attack_range: int = 4  # Chebyshev cells
    sight_range: int = 6
    cooldown: int = 1
    max_steps: int = 100
    kill_bonus: float = 10.0
    win_bonus: float = 200.0

    @property
    def n_agents(self) -> int:
        return self.n_allies

    @property
    def n_actions(self) -> int:
        return 6 + self.n_enemies

    @property
    def has_action_mask(self) -> bool:
        return True

    @property
    def obs_dim(self) -> int:
        # own: hp, cd_ready, y, x  + per-enemy: visible, rel_y, rel_x, hp, in_range
        # + per-other-ally: visible, rel_y, rel_x, hp
        return 4 + self.n_enemies * 5 + (self.n_allies - 1) * 4

    @property
    def max_reward(self) -> float:
        return (
            self.n_enemies * self.max_hp
            + self.n_enemies * self.kill_bonus
            + self.win_bonus
        )

    # ----------------------------------------------------------------- reset

    def reset(self, key):
        k_a, k_e = jax.random.split(key)
        N, M = self.n_allies, self.n_enemies
        # allies spawn on the left quarter, enemies on the right quarter
        ar = jax.random.randint(k_a, (N,), 0, self.rows)
        ac = jax.random.randint(jax.random.fold_in(k_a, 1), (N,), 0, self.cols // 4)
        er = jax.random.randint(k_e, (M,), 0, self.rows)
        ec = jax.random.randint(
            jax.random.fold_in(k_e, 1), (M,), 3 * self.cols // 4, self.cols
        )
        state = CombatState(
            ally_pos=jnp.stack([ar, ac], -1).astype(jnp.int32),
            ally_hp=jnp.full((N,), self.max_hp, jnp.float32),
            ally_cd=jnp.zeros((N,), jnp.int32),
            enemy_pos=jnp.stack([er, ec], -1).astype(jnp.int32),
            enemy_hp=jnp.full((M,), self.max_hp, jnp.float32),
            enemy_cd=jnp.zeros((M,), jnp.int32),
            t=jnp.asarray(0, jnp.int32),
        )
        zeros = jnp.zeros((N,), jnp.float32)
        ts = TimeStep(
            obs=self._make_obs(state),
            reward=zeros,
            stat_reward=zeros,
            terminated=jnp.asarray(False),
            truncated=jnp.asarray(False),
            action_mask=self.avail_actions(state),
        )
        return state, ts

    # ------------------------------------------------------------------ masks

    def avail_actions(self, state: CombatState):
        """(N, A) float mask: SMAC availability rules."""
        N, M = self.n_allies, self.n_enemies
        alive = state.ally_hp > 0  # (N,)
        e_alive = state.enemy_hp > 0  # (M,)

        target = state.ally_pos[:, None, :] + jnp.asarray(_MOVE_DELTAS)[None, 2:6, :]
        move_ok = (
            (target[..., 0] >= 0)
            & (target[..., 0] < self.rows)
            & (target[..., 1] >= 0)
            & (target[..., 1] < self.cols)
        )  # (N, 4)

        dist = jnp.max(
            jnp.abs(state.ally_pos[:, None, :] - state.enemy_pos[None, :, :]), axis=-1
        )  # (N, M) Chebyshev
        attack_ok = e_alive[None, :] & (dist <= self.attack_range)  # (N, M)

        mask = jnp.concatenate(
            [
                (~alive)[:, None],  # noop only when dead
                alive[:, None],  # stop
                move_ok & alive[:, None],
                attack_ok & alive[:, None],
            ],
            axis=1,
        )
        return mask.astype(jnp.float32)

    # ------------------------------------------------------------------ step

    def step(self, state: CombatState, actions, key):
        N, M = self.n_allies, self.n_enemies
        actions = jnp.asarray(actions, jnp.int32)
        alive = state.ally_hp > 0
        e_alive = state.enemy_hp > 0

        # invalid actions become STOP (masked policies should not emit them)
        mask = self.avail_actions(state)
        valid = jnp.take_along_axis(mask, actions[:, None], axis=1)[:, 0] > 0
        actions = jnp.where(valid, actions, STOP)

        # --- ally movement
        move_delta = jnp.asarray(_MOVE_DELTAS)[jnp.clip(actions, 0, 5)]
        is_move = (actions >= MOVE_N) & (actions <= MOVE_E) & alive
        ally_pos = jnp.clip(
            state.ally_pos + jnp.where(is_move[:, None], move_delta, 0),
            0,
            jnp.asarray([self.rows - 1, self.cols - 1]),
        )

        # --- ally attacks
        attacking = (actions >= 6) & alive & (state.ally_cd == 0)
        target_id = jnp.clip(actions - 6, 0, M - 1)
        dmg_to_enemy = (
            jnp.zeros((M,), jnp.float32)
            .at[jnp.where(attacking, target_id, M)]
            .add(self.damage, mode="drop")
        )
        dmg_to_enemy = jnp.minimum(dmg_to_enemy, state.enemy_hp)  # no overkill credit
        enemy_hp = jnp.maximum(state.enemy_hp - dmg_to_enemy, 0.0)
        kills = e_alive & (enemy_hp <= 0)
        ally_cd = jnp.where(attacking, self.cooldown, jnp.maximum(state.ally_cd - 1, 0))

        # --- scripted enemies: attack nearest ally in range, else advance
        dist = jnp.max(
            jnp.abs(state.enemy_pos[:, None, :] - ally_pos[None, :, :]), axis=-1
        )  # (M, N)
        dist = jnp.where(alive[None, :], dist, 10**6)
        nearest = jnp.argmin(dist, axis=1)  # (M,)
        nearest_dist = jnp.min(dist, axis=1)
        can_shoot = e_alive & (nearest_dist <= self.attack_range) & (state.enemy_cd == 0) & jnp.any(alive)
        dmg_to_ally = (
            jnp.zeros((N,), jnp.float32)
            .at[jnp.where(can_shoot, nearest, N)]
            .add(self.damage, mode="drop")
        )
        ally_hp = jnp.maximum(state.ally_hp - dmg_to_ally, 0.0)
        enemy_cd = jnp.where(can_shoot, self.cooldown, jnp.maximum(state.enemy_cd - 1, 0))

        # enemies not shooting step toward their nearest ally
        tgt_pos = ally_pos[nearest]  # (M, 2)
        step_vec = jnp.sign(tgt_pos - state.enemy_pos)
        advance = e_alive & ~can_shoot & jnp.any(alive)
        enemy_pos = jnp.clip(
            state.enemy_pos + jnp.where(advance[:, None], step_vec, 0),
            0,
            jnp.asarray([self.rows - 1, self.cols - 1]),
        )

        # --- shaped team reward (SMAC default: damage + kill + win bonuses,
        # normalised by max_reward, identical for all agents)
        win = ~jnp.any(enemy_hp > 0)
        shaped = (
            jnp.sum(dmg_to_enemy)
            + self.kill_bonus * jnp.sum(kills)
            + self.win_bonus * win
        ) / self.max_reward
        reward = jnp.full((N,), shaped, jnp.float32)

        t = state.t + 1
        lose = ~jnp.any(ally_hp > 0)
        terminated = win | lose | (t >= self.max_steps)

        new_state = CombatState(
            ally_pos=ally_pos,
            ally_hp=ally_hp,
            ally_cd=ally_cd,
            enemy_pos=enemy_pos,
            enemy_hp=enemy_hp,
            enemy_cd=enemy_cd,
            t=t,
        )
        ts = TimeStep(
            obs=self._make_obs(new_state),
            reward=reward,
            stat_reward=reward,
            terminated=terminated,
            truncated=jnp.asarray(False),
            action_mask=self.avail_actions(new_state),
        )
        return new_state, ts

    # ------------------------------------------------------------ observations

    def _make_obs(self, state: CombatState):
        N, M = self.n_allies, self.n_enemies
        scale_r, scale_c = float(self.rows), float(self.cols)

        def one_agent(i):
            pos = state.ally_pos[i]
            own = jnp.asarray(
                [
                    state.ally_hp[i] / self.max_hp,
                    (state.ally_cd[i] == 0).astype(jnp.float32),
                    pos[0] / scale_r,
                    pos[1] / scale_c,
                ]
            )
            # enemies
            rel_e = (state.enemy_pos - pos[None, :]).astype(jnp.float32)
            dist_e = jnp.max(jnp.abs(rel_e), axis=-1)
            vis_e = (state.enemy_hp > 0) & (dist_e <= self.sight_range)
            enemy_feats = jnp.stack(
                [
                    vis_e.astype(jnp.float32),
                    jnp.where(vis_e, rel_e[:, 0] / scale_r, 0.0),
                    jnp.where(vis_e, rel_e[:, 1] / scale_c, 0.0),
                    jnp.where(vis_e, state.enemy_hp / self.max_hp, 0.0),
                    (vis_e & (dist_e <= self.attack_range)).astype(jnp.float32),
                ],
                axis=-1,
            ).reshape(-1)
            # other allies (drop self slot)
            rel_a = (state.ally_pos - pos[None, :]).astype(jnp.float32)
            dist_a = jnp.max(jnp.abs(rel_a), axis=-1)
            vis_a = (state.ally_hp > 0) & (dist_a <= self.sight_range)
            ally_feats = jnp.stack(
                [
                    vis_a.astype(jnp.float32),
                    jnp.where(vis_a, rel_a[:, 0] / scale_r, 0.0),
                    jnp.where(vis_a, rel_a[:, 1] / scale_c, 0.0),
                    jnp.where(vis_a, state.ally_hp / self.max_hp, 0.0),
                ],
                axis=-1,
            )
            others = jnp.concatenate([ally_feats[:i], ally_feats[i + 1 :]], axis=0).reshape(-1)
            dead = state.ally_hp[i] <= 0
            obs = jnp.concatenate([own, enemy_feats, others])
            return jnp.where(dead, jnp.zeros_like(obs), obs)

        # unroll over the (small, static) agent count: the self-exclusion
        # slicing is index-dependent, so vmap does not apply directly
        return jnp.stack([one_agent(i) for i in range(N)])

    def render_frame(self, state) -> np.ndarray:
        cell = 10
        img = np.full((self.rows * cell, self.cols * cell, 3), 20, np.uint8)
        apos, ahp = np.asarray(state.ally_pos), np.asarray(state.ally_hp)
        epos, ehp = np.asarray(state.enemy_pos), np.asarray(state.enemy_hp)
        for i in range(self.n_allies):
            if ahp[i] > 0:
                r, c = apos[i]
                img[r * cell + 2 : (r + 1) * cell - 2, c * cell + 2 : (c + 1) * cell - 2] = (
                    0,
                    80 + int(170 * ahp[i] / self.max_hp),
                    220,
                )
        for j in range(self.n_enemies):
            if ehp[j] > 0:
                r, c = epos[j]
                img[r * cell + 2 : (r + 1) * cell - 2, c * cell + 2 : (c + 1) * cell - 2] = (
                    220,
                    80 + int(170 * ehp[j] / self.max_hp),
                    0,
                )
        return img


def parse_smaclite_name(name: str) -> SmacLiteCombat:
    """`smaclite:{N}m[_vs_{M}m][-v0]` marine scenarios."""
    base = name.split(":")[-1].split("-")[0]
    parts = base.split("_vs_")
    n = int(parts[0].rstrip("m"))
    m = int(parts[1].rstrip("m")) if len(parts) > 1 else n
    return SmacLiteCombat(n_allies=n, n_enemies=m)
