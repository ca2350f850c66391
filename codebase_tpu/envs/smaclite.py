"""SMAC-style cooperative micromanagement combat with action masking.

The reference integrates SMAClite through a thin adapter whose contract is:
integer actions, one scalar team reward broadcast to all agents, and
per-agent `action_mask` in the step info
(`marlbase/utils/smaclite_wrapper.py:10-25`); masks are threaded through
every loss and the exploration policies (`dqn/model.py:100-113`,
`ac/model.py:135-145`). This module provides that whole capability natively:
a vectorisable gridworld micromanagement battle in the SMAC mould with the
classic scenario roster — marines, stalkers, zealots, marauders and healing
medivacs — health, per-type damage/range/cooldown, a scripted opponent,
shaped team rewards and win bonuses, with exact SMAC-style action semantics:

- actions: 0 = no-op (only valid when dead), 1 = stop, 2..5 = move N/S/W/E,
  6+j = attack enemy j — except medivacs, whose target slots heal ALLY j
  (SMAC's medivac convention); `n_actions = 6 + max targets`, shorter
  target lists are masked off;
- masks: each agent's valid-action vector, exposed via
  `TimeStep.action_mask` with `has_action_mask = True`;
- reward: (damage dealt + kill bonus per kill + win bonus on victory)
  normalised by max_reward, identical for every agent (the scalar broadcast
  of `smaclite_wrapper.py:19-22`);
- termination: one side eliminated or `max_steps`;
- observations: own features + per-enemy and per-ally feature blocks, with
  unit-type one-hots appended when the scenario is heterogeneous
  (SMAC's `unit_type_bits` convention — homogeneous scenarios carry none).

Scenario ids (optionally prefixed `smaclite:` and suffixed `-v0`):
`{N}m[_vs_{M}m]` marine fights, `2s3z`, `3s5z`, `3s5z_vs_3s6z`
(stalkers+zealots), `MMM`, `MMM2` (medivac+marauders+marines), and any
`<count><unit>...[_vs_...]` combo with units m/s/z/r/d
(marine/stalker/zealot/marauder/medivac).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from codebase_tpu.envs.api import Environment, TimeStep

NOOP, STOP, MOVE_N, MOVE_S, MOVE_W, MOVE_E = range(6)
_MOVE_DELTAS = np.array(
    [[0, 0], [0, 0], [-1, 0], [1, 0], [0, -1], [0, 1]], dtype=np.int32
)

# unit stats: (max_hp incl shields, damage-or-heal per shot, attack range
# [Chebyshev cells], cooldown steps, is_healer). Condensed from the SC2
# unit table the smaclite package mirrors.
UNIT_STATS = {
    "marine": (45.0, 6.0, 4, 1, False),
    "stalker": (160.0, 13.0, 5, 1, False),
    "zealot": (150.0, 16.0, 1, 1, False),
    "marauder": (125.0, 10.0, 5, 1, False),
    # medivac heal-per-shot follows smaclite/SC2's ~9 hp/s heal rate (one
    # shot per condensed step ~ one second), not a damage-scale value
    "medivac": (150.0, 9.0, 4, 1, True),
}
_UNIT_ORDER = tuple(UNIT_STATS)


@struct.dataclass
class CombatState:
    ally_pos: jnp.ndarray  # (N, 2) int32
    ally_hp: jnp.ndarray  # (N,) float32
    ally_cd: jnp.ndarray  # (N,) int32 cooldown counters
    enemy_pos: jnp.ndarray  # (M, 2) int32
    enemy_hp: jnp.ndarray  # (M,) float32
    enemy_cd: jnp.ndarray  # (M,) int32
    t: jnp.ndarray  # () int32


@struct.dataclass
class CombatBatchState:
    """E env instances, struct-of-arrays with the env axis LAST (full TPU
    lane utilisation — see `Environment.reset_batch` / `LBFBatchState`)."""

    ally_r: jnp.ndarray  # (N, E) int32
    ally_c: jnp.ndarray  # (N, E) int32
    ally_hp: jnp.ndarray  # (N, E) float32
    ally_cd: jnp.ndarray  # (N, E) int32
    enemy_r: jnp.ndarray  # (M, E) int32
    enemy_c: jnp.ndarray  # (M, E) int32
    enemy_hp: jnp.ndarray  # (M, E) float32
    enemy_cd: jnp.ndarray  # (M, E) int32
    t: jnp.ndarray  # (E,) int32


@dataclass(frozen=True)
class SmacLiteCombat(Environment):
    n_allies: int = 5
    n_enemies: int = 5
    # unit type names per slot; empty = all marines (backward compatible)
    ally_types: Tuple[str, ...] = ()
    enemy_types: Tuple[str, ...] = ()
    rows: int = 16
    cols: int = 16
    sight_range: int = 6
    max_steps: int = 100
    kill_bonus: float = 10.0
    win_bonus: float = 200.0
    # optional uniform overrides of the per-type stats (None = use the table)
    max_hp: float = None  # type: ignore[assignment]
    damage: float = None  # type: ignore[assignment]
    attack_range: int = None  # type: ignore[assignment]
    cooldown: int = None  # type: ignore[assignment]

    # ------------------------------------------------------------- type stats

    @property
    def a_types(self) -> Tuple[str, ...]:
        return self.ally_types or ("marine",) * self.n_allies

    @property
    def e_types(self) -> Tuple[str, ...]:
        return self.enemy_types or ("marine",) * self.n_enemies

    def _stats(self, types, idx):
        override = (self.max_hp, self.damage, self.attack_range, self.cooldown, None)[idx]
        if override is not None:
            return np.asarray([override] * len(types))
        return np.asarray([UNIT_STATS[t][idx] for t in types])

    @property
    def n_agents(self) -> int:
        return len(self.a_types)

    @property
    def _n_e(self) -> int:
        return len(self.e_types)

    @property
    def _has_medivac(self) -> bool:
        return any(UNIT_STATS[t][4] for t in self.a_types + self.e_types)

    @property
    def n_actions(self) -> int:
        # medivac target slots index allies; uniform action space = 6 + max
        n_targets = self._n_e
        if self._has_medivac:
            n_targets = max(n_targets, self.n_agents, len(self.e_types))
        return 6 + n_targets

    @property
    def has_action_mask(self) -> bool:
        return True

    @property
    def type_bits(self) -> int:
        """SMAC unit_type_bits: one-hot width, 0 for homogeneous scenarios."""
        distinct = sorted(set(self.a_types + self.e_types), key=_UNIT_ORDER.index)
        return len(distinct) if len(distinct) > 1 else 0

    @property
    def _type_table(self) -> Tuple[str, ...]:
        return tuple(sorted(set(self.a_types + self.e_types), key=_UNIT_ORDER.index))

    def _type_onehot(self, types) -> np.ndarray:
        """(len(types), type_bits) one-hot rows (empty when homogeneous)."""
        tb = self.type_bits
        out = np.zeros((len(types), tb), np.float32)
        if tb:
            table = self._type_table
            for i, t in enumerate(types):
                out[i, table.index(t)] = 1.0
        return out

    @property
    def obs_dim(self) -> int:
        tb = self.type_bits
        # own: hp, cd_ready, y, x [+type] ; enemy: visible, rel_y, rel_x, hp,
        # in_range [+type] ; other ally: visible, rel_y, rel_x, hp [+type]
        return (4 + tb) + self._n_e * (5 + tb) + (self.n_agents - 1) * (4 + tb)

    @property
    def max_reward(self) -> float:
        return (
            float(self._stats(self.e_types, 0).sum())
            + len(self.e_types) * self.kill_bonus
            + self.win_bonus
        )

    # ----------------------------------------------------------------- reset

    def reset(self, key):
        state = self._reset_state(key)
        zeros = jnp.zeros((self.n_agents,), jnp.float32)
        ts = TimeStep(
            obs=self._make_obs(state),
            reward=zeros,
            stat_reward=zeros,
            terminated=jnp.asarray(False),
            truncated=jnp.asarray(False),
            action_mask=self.avail_actions(state),
        )
        return state, ts

    def _reset_state(self, key) -> CombatState:
        k_a, k_e = jax.random.split(key)
        N, M = self.n_agents, self._n_e
        # allies spawn on the left quarter, enemies on the right quarter
        ar = jax.random.randint(k_a, (N,), 0, self.rows)
        ac = jax.random.randint(jax.random.fold_in(k_a, 1), (N,), 0, self.cols // 4)
        er = jax.random.randint(k_e, (M,), 0, self.rows)
        ec = jax.random.randint(
            jax.random.fold_in(k_e, 1), (M,), 3 * self.cols // 4, self.cols
        )
        return CombatState(
            ally_pos=jnp.stack([ar, ac], -1).astype(jnp.int32),
            ally_hp=jnp.asarray(self._stats(self.a_types, 0), jnp.float32),
            ally_cd=jnp.zeros((N,), jnp.int32),
            enemy_pos=jnp.stack([er, ec], -1).astype(jnp.int32),
            enemy_hp=jnp.asarray(self._stats(self.e_types, 0), jnp.float32),
            enemy_cd=jnp.zeros((M,), jnp.int32),
            t=jnp.asarray(0, jnp.int32),
        )

    # ------------------------------------------------------- batched (E-last)

    @staticmethod
    def to_batch(states: CombatState) -> CombatBatchState:
        """Convert vmapped scalar states (leading E axis) to E-last SoA."""
        return CombatBatchState(
            ally_r=states.ally_pos[..., 0].T,
            ally_c=states.ally_pos[..., 1].T,
            ally_hp=states.ally_hp.T,
            ally_cd=states.ally_cd.T,
            enemy_r=states.enemy_pos[..., 0].T,
            enemy_c=states.enemy_pos[..., 1].T,
            enemy_hp=states.enemy_hp.T,
            enemy_cd=states.enemy_cd.T,
            t=states.t,
        )

    @staticmethod
    def from_batch(state: CombatBatchState) -> CombatState:
        return CombatState(
            ally_pos=jnp.stack([state.ally_r.T, state.ally_c.T], axis=-1),
            ally_hp=state.ally_hp.T,
            ally_cd=state.ally_cd.T,
            enemy_pos=jnp.stack([state.enemy_r.T, state.enemy_c.T], axis=-1),
            enemy_hp=state.enemy_hp.T,
            enemy_cd=state.enemy_cd.T,
            t=state.t,
        )

    def reset_batch(self, key, n: int):
        states = jax.vmap(self._reset_state)(jax.random.split(key, n))
        bstate = self.to_batch(states)
        zeros = jnp.zeros((n, self.n_agents), jnp.float32)
        obs, mask = self._outputs_batch(bstate)
        ts = TimeStep(
            obs=obs,
            reward=zeros,
            stat_reward=zeros,
            terminated=jnp.zeros((n,), bool),
            truncated=jnp.zeros((n,), bool),
            action_mask=mask,
        )
        return bstate, ts

    def _avail_actions_batch(self, state: CombatBatchState):
        """(E, N, A) masks, E-last compute — same rules as `avail_actions`."""
        return self._outputs_batch(state)[1]

    def _outputs_batch(self, state: CombatBatchState):
        """(obs (E, N, D), mask (E, N, A)) in ONE traced function.

        The observation's enemy in-range feature and the mask's attack
        availability are the same viewer->target geometry; computing both
        here shares the relative-coordinate / Chebyshev-distance arrays and
        the alive/visibility predicates instead of materialising them twice
        per rollout step (round-3 profiling: the SMAClite lane is
        rollout-bound once updates amortise over enough envs)."""
        N, M = self.n_agents, self._n_e
        E = state.ally_r.shape[1]
        scale_r, scale_c = float(self.rows), float(self.cols)
        alive = state.ally_hp > 0  # (N, E)
        e_alive = state.enemy_hp > 0  # (M, E)
        a_range = jnp.asarray(self._stats(self.a_types, 2), jnp.int32)[:, None]
        healer = jnp.asarray(self._stats(self.a_types, 4).astype(bool))[:, None]
        a_maxhp = jnp.asarray(self._stats(self.a_types, 0), jnp.float32)[:, None]
        e_maxhp = jnp.asarray(self._stats(self.e_types, 0), jnp.float32)[:, None]
        tb = self.type_bits
        a_onehot = jnp.asarray(self._type_onehot(self.a_types))  # (N, tb)
        e_onehot = jnp.asarray(self._type_onehot(self.e_types))  # (M, tb)

        # ------------------------------------------------ shared geometry
        # enemies: viewer axis N, target axis M
        rel_er = (state.enemy_r[None] - state.ally_r[:, None, :]).astype(jnp.float32)
        rel_ec = (state.enemy_c[None] - state.ally_c[:, None, :]).astype(jnp.float32)
        dist_e = jnp.maximum(jnp.abs(rel_er), jnp.abs(rel_ec))  # (N, M, E)
        in_attack_range = e_alive[None] & (dist_e <= a_range[:, None, :])  # (N, M, E)
        # allies: viewer axis N, target axis N'
        rel_ar = (state.ally_r[None] - state.ally_r[:, None, :]).astype(jnp.float32)
        rel_ac = (state.ally_c[None] - state.ally_c[:, None, :]).astype(jnp.float32)
        dist_a = jnp.maximum(jnp.abs(rel_ar), jnp.abs(rel_ac))  # (N, N, E)

        # ------------------------------------------------------------ mask
        move_ok = jnp.stack(
            [
                state.ally_r - 1 >= 0,  # N
                state.ally_r + 1 < self.rows,  # S
                state.ally_c - 1 >= 0,  # W
                state.ally_c + 1 < self.cols,  # E
            ],
            axis=1,
        )  # (N, 4, E)
        n_targets = self.n_actions - 6
        attack_ok = jnp.pad(in_attack_range, ((0, 0), (0, n_targets - M), (0, 0)))
        if self._has_medivac:
            damaged = alive & (state.ally_hp < a_maxhp)  # (N, E)
            not_self = ~jnp.eye(N, dtype=bool)[:, :, None]
            heal_ok = damaged[None] & (dist_a <= a_range[:, None, :]) & not_self
            heal_ok = jnp.pad(heal_ok, ((0, 0), (0, n_targets - N), (0, 0)))
            attack_ok = jnp.where(healer[:, None, :], heal_ok, attack_ok)
        mask = jnp.concatenate(
            [
                (~alive)[:, None, :],  # noop only when dead
                alive[:, None, :],  # stop
                move_ok & alive[:, None, :],
                attack_ok & alive[:, None, :],
            ],
            axis=1,
        ).astype(jnp.float32)  # (N, A, E)

        # ------------------------------------------------------------- obs
        own = [
            state.ally_hp / a_maxhp,
            (state.ally_cd == 0).astype(jnp.float32),
            state.ally_r.astype(jnp.float32) / scale_r,
            state.ally_c.astype(jnp.float32) / scale_c,
        ]
        if tb:
            own += [jnp.broadcast_to(a_onehot[:, k, None], (N, E)) for k in range(tb)]
        own = jnp.stack(own, axis=1)  # (N, 4+tb, E)

        vis_e = e_alive[None] & (dist_e <= self.sight_range)
        ecols = [
            vis_e.astype(jnp.float32),
            jnp.where(vis_e, rel_er / scale_r, 0.0),
            jnp.where(vis_e, rel_ec / scale_c, 0.0),
            jnp.where(vis_e, state.enemy_hp[None] / e_maxhp[None], 0.0),
            (vis_e & in_attack_range).astype(jnp.float32),
        ]
        if tb:
            ecols += [
                vis_e.astype(jnp.float32) * e_onehot[None, :, k, None]
                for k in range(tb)
            ]
        enemy_feats = jnp.stack(ecols, axis=2)  # (N, M, 5+tb, E)

        vis_a = alive[None] & (dist_a <= self.sight_range)
        acols = [
            vis_a.astype(jnp.float32),
            jnp.where(vis_a, rel_ar / scale_r, 0.0),
            jnp.where(vis_a, rel_ac / scale_c, 0.0),
            jnp.where(vis_a, state.ally_hp[None] / a_maxhp.T[None].reshape(1, N, 1), 0.0),
        ]
        if tb:
            acols += [
                vis_a.astype(jnp.float32) * a_onehot[None, :, k, None]
                for k in range(tb)
            ]
        ally_feats = jnp.stack(acols, axis=2)  # (N, N', 4+tb, E)
        # per viewer i: other allies in index order, skipping self (static)
        others = jnp.stack(
            [
                jnp.concatenate([ally_feats[i, :i], ally_feats[i, i + 1 :]], axis=0)
                for i in range(N)
            ]
        )  # (N, N-1, 4+tb, E)

        obs = jnp.concatenate(
            [
                own,
                enemy_feats.reshape(N, M * enemy_feats.shape[2], E),
                others.reshape(N, (N - 1) * others.shape[2], E),
            ],
            axis=1,
        )  # (N, D, E)
        dead = ~alive  # (N, E)
        obs = jnp.where(dead[:, None, :], 0.0, obs)
        return jnp.transpose(obs, (2, 0, 1)), jnp.transpose(mask, (2, 0, 1))

    def step_batch(self, state: CombatBatchState, actions, key, current_mask=None):
        """E-last batched transition — exactly `vmap(self.step)` semantics
        (pinned in tests/test_batched_env.py).

        `current_mask` ((E, N, A), optional): the availability mask for
        `state`, when the caller already holds it (rollout loops carry the
        previous TimeStep). Passing it skips one full availability
        recomputation per step — the validity check and the recompute are
        bit-identical, so this is purely a speed knob."""
        del key  # scalar step ignores its key too
        N, M = self.n_agents, self._n_e
        a = jnp.asarray(actions, jnp.int32).T  # (N, E)
        E = a.shape[1]
        alive = state.ally_hp > 0
        e_alive = state.enemy_hp > 0
        a_dmg = jnp.asarray(self._stats(self.a_types, 1), jnp.float32)[:, None]
        a_cds = jnp.asarray(self._stats(self.a_types, 3), jnp.int32)[:, None]
        a_maxhp = jnp.asarray(self._stats(self.a_types, 0), jnp.float32)[:, None]
        healer = jnp.asarray(self._stats(self.a_types, 4).astype(bool))[:, None]
        e_dmg = jnp.asarray(self._stats(self.e_types, 1), jnp.float32)[:, None]
        e_range = jnp.asarray(self._stats(self.e_types, 2), jnp.int32)[:, None]
        e_cds = jnp.asarray(self._stats(self.e_types, 3), jnp.int32)[:, None]
        e_maxhp = jnp.asarray(self._stats(self.e_types, 0), jnp.float32)[:, None]
        e_healer = jnp.asarray(self._stats(self.e_types, 4).astype(bool))[:, None]
        midx = jax.lax.broadcasted_iota(jnp.int32, (N, M, E), 1)
        nidx = jax.lax.broadcasted_iota(jnp.int32, (N, N, E), 1)

        # invalid actions become STOP
        if current_mask is None:
            current_mask = self._avail_actions_batch(state)
        mask = jnp.transpose(current_mask, (1, 2, 0))  # (N, A, E)
        aidx = jax.lax.broadcasted_iota(jnp.int32, mask.shape, 1)
        valid = jnp.sum(mask * (aidx == a[:, None, :]), axis=1) > 0
        a = jnp.where(valid, a, STOP)

        # --- ally movement (branchless deltas)
        is_move = (a >= MOVE_N) & (a <= MOVE_E) & alive
        dr = (a == MOVE_S).astype(jnp.int32) - (a == MOVE_N).astype(jnp.int32)
        dc = (a == MOVE_E).astype(jnp.int32) - (a == MOVE_W).astype(jnp.int32)
        ally_r = jnp.clip(state.ally_r + jnp.where(is_move, dr, 0), 0, self.rows - 1)
        ally_c = jnp.clip(state.ally_c + jnp.where(is_move, dc, 0), 0, self.cols - 1)

        # --- ally attacks / heals
        targeting = (a >= 6) & alive & (state.ally_cd == 0)
        attacking = targeting & ~healer
        healing = targeting & healer
        target_id = jnp.clip(a - 6, 0, max(M, N) - 1)  # (N, E)
        dmg_to_enemy = jnp.sum(
            (attacking[:, None, :] & (jnp.clip(target_id, 0, M - 1)[:, None, :] == midx))
            * a_dmg[:, None, :],
            axis=0,
        )  # (M, E)
        dmg_to_enemy = jnp.minimum(dmg_to_enemy, state.enemy_hp)  # no overkill credit
        enemy_hp = jnp.maximum(state.enemy_hp - dmg_to_enemy, 0.0)
        kills = e_alive & (enemy_hp <= 0)
        heal_to_ally = jnp.sum(
            (healing[:, None, :] & (jnp.clip(target_id, 0, N - 1)[:, None, :] == nidx))
            * a_dmg[:, None, :],
            axis=0,
        )  # (N, E)
        ally_cd = jnp.where(targeting, a_cds, jnp.maximum(state.ally_cd - 1, 0))

        # --- scripted enemies
        dist = jnp.maximum(
            jnp.abs(state.enemy_r[:, None, :] - ally_r[None]),
            jnp.abs(state.enemy_c[:, None, :] - ally_c[None]),
        )  # (M, N, E)
        dist = jnp.where(alive[None], dist, 10**6)
        nearest = jnp.argmin(dist, axis=1)  # (M, E)
        nearest_dist = jnp.min(dist, axis=1)
        any_ally = jnp.any(alive, axis=0)  # (E,)
        can_act = e_alive & (state.enemy_cd == 0) & any_ally[None, :]
        can_shoot = can_act & ~e_healer & (nearest_dist <= e_range)
        mnidx = jax.lax.broadcasted_iota(jnp.int32, (M, N, E), 1)
        near_onehot = nearest[:, None, :] == mnidx  # (M, N, E)
        dmg_to_ally = jnp.sum(
            (can_shoot[:, None, :] & near_onehot) * e_dmg[:, None, :], axis=0
        )  # (N, E)

        # enemy healers: most-damaged teammate, POST-damage hp (a unit whose
        # kill bonus was granted stays dead)
        e_alive_post = enemy_hp > 0  # (M, E)
        e_dist = jnp.maximum(
            jnp.abs(state.enemy_r[:, None, :] - state.enemy_r[None]),
            jnp.abs(state.enemy_c[:, None, :] - state.enemy_c[None]),
        )  # (M, M, E)
        deficit = jnp.where(e_alive_post, e_maxhp - enemy_hp, -1.0)  # (M, E)
        not_self_e = ~jnp.eye(M, dtype=bool)[:, :, None]
        healable = (deficit[None] > 0) & (e_dist <= e_range[:, None, :]) & not_self_e
        heal_target = jnp.argmax(
            jnp.where(healable, deficit[None], -1.0), axis=1
        )  # (M, E)
        can_heal = can_act & e_healer & jnp.any(healable, axis=1)
        mmidx = jax.lax.broadcasted_iota(jnp.int32, (M, M, E), 1)
        heal_to_enemy = jnp.sum(
            (can_heal[:, None, :] & (heal_target[:, None, :] == mmidx))
            * e_dmg[:, None, :],
            axis=0,
        )  # (M, E)

        ally_hp = jnp.clip(state.ally_hp - dmg_to_ally + heal_to_ally, 0.0, a_maxhp)
        ally_hp = jnp.where(alive, ally_hp, 0.0)  # heals cannot resurrect
        enemy_hp = jnp.clip(enemy_hp + heal_to_enemy, 0.0, e_maxhp)
        enemy_hp = jnp.where(e_alive_post, enemy_hp, 0.0)
        acted = can_shoot | can_heal
        enemy_cd = jnp.where(acted, e_cds, jnp.maximum(state.enemy_cd - 1, 0))

        # enemies not acting step toward their nearest ally
        tgt_r = jnp.sum(near_onehot * ally_r[None], axis=1)  # (M, E)
        tgt_c = jnp.sum(near_onehot * ally_c[None], axis=1)
        advance = e_alive & ~acted & any_ally[None, :]
        enemy_r = jnp.clip(
            state.enemy_r + jnp.where(advance, jnp.sign(tgt_r - state.enemy_r), 0),
            0,
            self.rows - 1,
        )
        enemy_c = jnp.clip(
            state.enemy_c + jnp.where(advance, jnp.sign(tgt_c - state.enemy_c), 0),
            0,
            self.cols - 1,
        )

        # --- shaped team reward
        win = ~jnp.any(enemy_hp > 0, axis=0)  # (E,)
        shaped = (
            jnp.sum(dmg_to_enemy, axis=0)
            + self.kill_bonus * jnp.sum(kills, axis=0)
            + self.win_bonus * win
        ) / self.max_reward
        reward = jnp.broadcast_to(shaped[None, :], (N, E))

        t = state.t + 1
        lose = ~jnp.any(ally_hp > 0, axis=0)
        terminated = win | lose | (t >= self.max_steps)

        new_state = CombatBatchState(
            ally_r=ally_r,
            ally_c=ally_c,
            ally_hp=ally_hp,
            ally_cd=ally_cd,
            enemy_r=enemy_r,
            enemy_c=enemy_c,
            enemy_hp=enemy_hp,
            enemy_cd=enemy_cd,
            t=t,
        )
        obs, next_mask = self._outputs_batch(new_state)
        ts = TimeStep(
            obs=obs,
            reward=reward.T,
            stat_reward=reward.T,
            terminated=terminated,
            truncated=jnp.zeros((E,), bool),
            action_mask=next_mask,
        )
        return new_state, ts

    def _make_obs_batch(self, state: CombatBatchState):
        """(E, N, D) observations, E-last — same layout as `_make_obs`."""
        return self._outputs_batch(state)[0]

    # ------------------------------------------------------------------ masks

    def avail_actions(self, state: CombatState):
        """(N, A) float mask: SMAC availability rules. Attack slots target
        enemies for fighters, allies (heal, not self, damaged) for medivacs."""
        N, M = self.n_agents, self._n_e
        alive = state.ally_hp > 0  # (N,)
        e_alive = state.enemy_hp > 0  # (M,)
        a_range = jnp.asarray(self._stats(self.a_types, 2), jnp.int32)  # (N,)
        healer = jnp.asarray(self._stats(self.a_types, 4).astype(bool))  # (N,)
        a_maxhp = jnp.asarray(self._stats(self.a_types, 0), jnp.float32)

        target = state.ally_pos[:, None, :] + jnp.asarray(_MOVE_DELTAS)[None, 2:6, :]
        move_ok = (
            (target[..., 0] >= 0)
            & (target[..., 0] < self.rows)
            & (target[..., 1] >= 0)
            & (target[..., 1] < self.cols)
        )  # (N, 4)

        n_targets = self.n_actions - 6
        dist_e = jnp.max(
            jnp.abs(state.ally_pos[:, None, :] - state.enemy_pos[None, :, :]), axis=-1
        )  # (N, M)
        attack_ok = e_alive[None, :] & (dist_e <= a_range[:, None])  # (N, M)
        attack_ok = jnp.pad(attack_ok, ((0, 0), (0, n_targets - M)))

        if self._has_medivac:
            dist_a = jnp.max(
                jnp.abs(state.ally_pos[:, None, :] - state.ally_pos[None, :, :]),
                axis=-1,
            )  # (N, N)
            damaged = alive & (state.ally_hp < a_maxhp)  # (N,)
            heal_ok = (
                damaged[None, :]
                & (dist_a <= a_range[:, None])
                & ~jnp.eye(N, dtype=bool)  # cannot heal self
            )  # (N, N)
            heal_ok = jnp.pad(heal_ok, ((0, 0), (0, n_targets - N)))
            attack_ok = jnp.where(healer[:, None], heal_ok, attack_ok)

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
        N, M = self.n_agents, self._n_e
        actions = jnp.asarray(actions, jnp.int32)
        alive = state.ally_hp > 0
        e_alive = state.enemy_hp > 0
        a_dmg = jnp.asarray(self._stats(self.a_types, 1), jnp.float32)
        a_cds = jnp.asarray(self._stats(self.a_types, 3), jnp.int32)
        a_maxhp = jnp.asarray(self._stats(self.a_types, 0), jnp.float32)
        healer = jnp.asarray(self._stats(self.a_types, 4).astype(bool))
        e_dmg = jnp.asarray(self._stats(self.e_types, 1), jnp.float32)
        e_range = jnp.asarray(self._stats(self.e_types, 2), jnp.int32)
        e_cds = jnp.asarray(self._stats(self.e_types, 3), jnp.int32)
        e_maxhp = jnp.asarray(self._stats(self.e_types, 0), jnp.float32)
        e_healer = jnp.asarray(self._stats(self.e_types, 4).astype(bool))

        # invalid actions become STOP (masked policies should not emit them)
        mask = self.avail_actions(state)
        valid = jnp.sum(mask * jax.nn.one_hot(actions, mask.shape[1]), axis=1) > 0
        actions = jnp.where(valid, actions, STOP)

        # --- ally movement
        move_delta = jnp.asarray(_MOVE_DELTAS)[jnp.clip(actions, 0, 5)]
        is_move = (actions >= MOVE_N) & (actions <= MOVE_E) & alive
        ally_pos = jnp.clip(
            state.ally_pos + jnp.where(is_move[:, None], move_delta, 0),
            0,
            jnp.asarray([self.rows - 1, self.cols - 1]),
        )

        # --- ally attacks / heals
        targeting = (actions >= 6) & alive & (state.ally_cd == 0)
        attacking = targeting & ~healer
        healing = targeting & healer
        target_id = jnp.clip(actions - 6, 0, max(M, N) - 1)
        dmg_to_enemy = (
            jnp.zeros((M,), jnp.float32)
            .at[jnp.where(attacking, jnp.clip(target_id, 0, M - 1), M)]
            .add(jnp.where(attacking, a_dmg, 0.0), mode="drop")
        )
        dmg_to_enemy = jnp.minimum(dmg_to_enemy, state.enemy_hp)  # no overkill credit
        enemy_hp = jnp.maximum(state.enemy_hp - dmg_to_enemy, 0.0)
        kills = e_alive & (enemy_hp <= 0)
        heal_to_ally = (
            jnp.zeros((N,), jnp.float32)
            .at[jnp.where(healing, jnp.clip(target_id, 0, N - 1), N)]
            .add(jnp.where(healing, a_dmg, 0.0), mode="drop")
        )
        ally_cd = jnp.where(targeting, a_cds, jnp.maximum(state.ally_cd - 1, 0))

        # --- scripted enemies: fighters attack the nearest ally in range,
        # else advance; enemy medivacs heal their most-damaged teammate
        dist = jnp.max(
            jnp.abs(state.enemy_pos[:, None, :] - ally_pos[None, :, :]), axis=-1
        )  # (M, N)
        dist = jnp.where(alive[None, :], dist, 10**6)
        nearest = jnp.argmin(dist, axis=1)  # (M,)
        nearest_dist = jnp.min(dist, axis=1)
        any_ally = jnp.any(alive)
        can_act = e_alive & (state.enemy_cd == 0) & any_ally
        can_shoot = can_act & ~e_healer & (nearest_dist <= e_range)
        dmg_to_ally = (
            jnp.zeros((N,), jnp.float32)
            .at[jnp.where(can_shoot, nearest, N)]
            .add(jnp.where(can_shoot, e_dmg, 0.0), mode="drop")
        )

        # enemy healers: most-damaged teammate within range. Targeting and
        # the resurrect guard use POST-damage hp — a unit killed this step
        # (kill bonus already granted) stays dead and cannot be healed.
        e_alive_post = enemy_hp > 0  # (M,) after ally damage
        e_dist = jnp.max(
            jnp.abs(state.enemy_pos[:, None, :] - state.enemy_pos[None, :, :]), axis=-1
        )  # (M, M)
        deficit = jnp.where(e_alive_post, e_maxhp - enemy_hp, -1.0)  # (M,)
        healable = (
            (deficit[None, :] > 0)
            & (e_dist <= e_range[:, None])
            & ~jnp.eye(M, dtype=bool)
        )  # (M, M)
        heal_target = jnp.argmax(jnp.where(healable, deficit[None, :], -1.0), axis=1)
        can_heal = can_act & e_healer & jnp.any(healable, axis=1)
        heal_to_enemy = (
            jnp.zeros((M,), jnp.float32)
            .at[jnp.where(can_heal, heal_target, M)]
            .add(jnp.where(can_heal, e_dmg, 0.0), mode="drop")
        )

        ally_hp = jnp.clip(state.ally_hp - dmg_to_ally + heal_to_ally, 0.0, a_maxhp)
        ally_hp = jnp.where(alive, ally_hp, 0.0)  # heals cannot resurrect
        enemy_hp = jnp.clip(enemy_hp + heal_to_enemy, 0.0, e_maxhp)
        enemy_hp = jnp.where(e_alive_post, enemy_hp, 0.0)
        acted = can_shoot | can_heal
        enemy_cd = jnp.where(acted, e_cds, jnp.maximum(state.enemy_cd - 1, 0))

        # enemies not acting step toward their nearest ally
        tgt_pos = ally_pos[nearest]  # (M, 2)
        step_vec = jnp.sign(tgt_pos - state.enemy_pos)
        advance = e_alive & ~acted & any_ally
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
        N, M = self.n_agents, self._n_e
        scale_r, scale_c = float(self.rows), float(self.cols)
        a_maxhp = jnp.asarray(self._stats(self.a_types, 0), jnp.float32)
        a_range = jnp.asarray(self._stats(self.a_types, 2), jnp.int32)
        e_maxhp = jnp.asarray(self._stats(self.e_types, 0), jnp.float32)
        tb = self.type_bits
        a_onehot = jnp.asarray(self._type_onehot(self.a_types))  # (N, tb)
        e_onehot = jnp.asarray(self._type_onehot(self.e_types))  # (M, tb)

        def one_agent(i):
            pos = state.ally_pos[i]
            own = jnp.asarray(
                [
                    state.ally_hp[i] / a_maxhp[i],
                    (state.ally_cd[i] == 0).astype(jnp.float32),
                    pos[0] / scale_r,
                    pos[1] / scale_c,
                ]
            )
            if tb:
                own = jnp.concatenate([own, a_onehot[i]])
            # enemies
            rel_e = (state.enemy_pos - pos[None, :]).astype(jnp.float32)
            dist_e = jnp.max(jnp.abs(rel_e), axis=-1)
            vis_e = (state.enemy_hp > 0) & (dist_e <= self.sight_range)
            cols_e = [
                vis_e.astype(jnp.float32),
                jnp.where(vis_e, rel_e[:, 0] / scale_r, 0.0),
                jnp.where(vis_e, rel_e[:, 1] / scale_c, 0.0),
                jnp.where(vis_e, state.enemy_hp / e_maxhp, 0.0),
                (vis_e & (dist_e <= a_range[i])).astype(jnp.float32),
            ]
            enemy_feats = jnp.stack(cols_e, axis=-1)
            if tb:
                enemy_feats = jnp.concatenate(
                    [enemy_feats, vis_e[:, None] * e_onehot], axis=-1
                )
            # other allies (drop self slot)
            rel_a = (state.ally_pos - pos[None, :]).astype(jnp.float32)
            dist_a = jnp.max(jnp.abs(rel_a), axis=-1)
            vis_a = (state.ally_hp > 0) & (dist_a <= self.sight_range)
            ally_feats = jnp.stack(
                [
                    vis_a.astype(jnp.float32),
                    jnp.where(vis_a, rel_a[:, 0] / scale_r, 0.0),
                    jnp.where(vis_a, rel_a[:, 1] / scale_c, 0.0),
                    jnp.where(vis_a, state.ally_hp / a_maxhp, 0.0),
                ],
                axis=-1,
            )
            if tb:
                ally_feats = jnp.concatenate(
                    [ally_feats, vis_a[:, None] * a_onehot], axis=-1
                )
            others = jnp.concatenate(
                [ally_feats[:i], ally_feats[i + 1 :]], axis=0
            ).reshape(-1)
            dead = state.ally_hp[i] <= 0
            obs = jnp.concatenate([own, enemy_feats.reshape(-1), others])
            return jnp.where(dead, jnp.zeros_like(obs), obs)

        # unroll over the (small, static) agent count: the self-exclusion
        # slicing is index-dependent, so vmap does not apply directly
        return jnp.stack([one_agent(i) for i in range(N)])

    def render_frame(self, state) -> np.ndarray:
        cell = 10
        img = np.full((self.rows * cell, self.cols * cell, 3), 20, np.uint8)
        apos, ahp = np.asarray(state.ally_pos), np.asarray(state.ally_hp)
        epos, ehp = np.asarray(state.enemy_pos), np.asarray(state.enemy_hp)
        a_maxhp = self._stats(self.a_types, 0)
        e_maxhp = self._stats(self.e_types, 0)
        for i in range(self.n_agents):
            if ahp[i] > 0:
                r, c = apos[i]
                img[r * cell + 2 : (r + 1) * cell - 2, c * cell + 2 : (c + 1) * cell - 2] = (
                    0,
                    80 + int(170 * ahp[i] / a_maxhp[i]),
                    220,
                )
        for j in range(self._n_e):
            if ehp[j] > 0:
                r, c = epos[j]
                img[r * cell + 2 : (r + 1) * cell - 2, c * cell + 2 : (c + 1) * cell - 2] = (
                    220,
                    80 + int(170 * ehp[j] / e_maxhp[j]),
                    0,
                )
        return img


_UNIT_LETTERS = {
    "m": "marine",
    "s": "stalker",
    "z": "zealot",
    "r": "marauder",
    "d": "medivac",
}


def _parse_side(spec: str) -> Tuple[str, ...]:
    """'3s5z' -> 3 stalkers + 5 zealots; 'MMM'-family handled by caller."""
    units = []
    count = ""
    for ch in spec:
        if ch.isdigit():
            count += ch
        else:
            assert ch in _UNIT_LETTERS, f"unknown unit letter {ch!r} in {spec!r}"
            units.extend([_UNIT_LETTERS[ch]] * int(count or 1))
            count = ""
    assert not count, f"trailing count in {spec!r}"
    return tuple(units)


def parse_smaclite_name(name: str) -> SmacLiteCombat:
    """Scenario ids: `{N}m[_vs_{M}m]`, `2s3z`, `3s5z`, `3s5z_vs_3s6z`,
    `MMM`, `MMM2`, or any `<count><unit>` combo (units m/s/z/r/d),
    optionally `smaclite:`-prefixed and `-v0`-suffixed."""
    base = name.split(":")[-1].split("-")[0]
    if base == "MMM":
        allies = enemies = ("medivac",) + ("marauder",) * 2 + ("marine",) * 7
    elif base == "MMM2":
        allies = ("medivac",) + ("marauder",) * 2 + ("marine",) * 7
        enemies = ("medivac",) + ("marauder",) * 3 + ("marine",) * 8
    else:
        parts = base.split("_vs_")
        allies = _parse_side(parts[0])
        enemies = _parse_side(parts[1]) if len(parts) > 1 else allies
    return SmacLiteCombat(
        n_allies=len(allies),
        n_enemies=len(enemies),
        ally_types=allies,
        enemy_types=enemies,
    )
