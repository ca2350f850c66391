"""Driver-reproducible benchmark suite with MFU.

Measures the fused-train-loop throughput of every BASELINE.md config on the
current backend and derives MFU (model FLOPs utilisation) from the compiled
chunk's XLA cost analysis:

    MFU = (compiled FLOPs per chunk / best chunk wall time) / chip peak FLOPs

The reference has no benchmark suite at all (it measures FPS at runtime and
records nothing, `marlbase/utils/loggers.py:69-71`); the configs below are
the tracked set from BASELINE.md: five tuned throughput lanes, two
compute-dominant MMM2 configs (DQN and AC families), a reference-shape
lane bounding realistic training throughput, and the fused-vs-scan RNN
pair.

RL env-stepping is elementwise-heavy, so MFU is expected to be far below
LLM-style numbers — it is reported so perf claims carry a FLOPs-utilisation
figure, not just env-steps/s (VERDICT round 1, "What's weak" #3).

Usage:
    python -m codebase_tpu.bench_suite            # all configs, 1 JSON line each
    python -m codebase_tpu.bench_suite --only idqn_lbf
    python bench.py                               # headline + embedded suite
"""

from __future__ import annotations

import argparse
import json
import time

import jax

# Peak dense bf16 FLOP/s per chip by device kind (public TPU specs).
PEAK_FLOPS = {
    "TPU v2": 46e12,
    "TPU v3": 123e12,
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}

# Peak HBM bandwidth per chip, bytes/s (public TPU specs). RL env stepping
# is elementwise-dominated, so the binding roofline is BANDWIDTH, not FLOPs:
# bandwidth_util (= XLA-estimated bytes accessed / wall time / peak BW) is
# the honest speed-of-light figure for these kernels, with MFU reported
# alongside for completeness.
PEAK_HBM_BW = {
    "TPU v2": 700e9,
    "TPU v3": 900e9,
    "TPU v4": 1228e9,
    "TPU v5 lite": 819e9,
    "TPU v5e": 819e9,
    "TPU v5p": 2765e9,
    "TPU v6 lite": 1640e9,
    "TPU v6e": 1640e9,
}

# The tracked BASELINE.md configs. `overrides` are dot-path config overrides on
# top of the algorithm preset; env batch sizes are the round-1 tuned values.
CONFIGS = {
    "idqn_lbf": dict(
        algo="idqn",
        env="lbforaging:Foraging-8x8-2p-3f-v3",
        time_limit=25,
        overrides=[
            "algorithm.parallel_envs=65536",
            "algorithm.batch_size=512",
            "algorithm.updates_per_collect=8",
            "algorithm.buffer_size=65536",
            "algorithm.training_start=0",
            # throughput configs use the clean insert: the default
            # reference-quirk slot reuse (stale-tail merge, ops/replay.py)
            # re-reads every overwritten slot block per iteration, which
            # only matters for wide-collect benches, not the parity gate
            "algorithm.replay_slot_reuse=clear",
            # round-5 A/B (quiet box, 5 windows): LBF episodes run ~the
            # full T, so the early-exit collector's per-step any() check is
            # pure overhead — scan 107.4M vs early-exit 103.2M steps/s.
            # Early exit stays on (auto) only for the SMAClite lanes, whose
            # episodes end at ~23/60 steps (+6.8% there).
            "algorithm.rollout_early_exit=off",
        ],
    ),
    "ia2c_lbf": dict(
        algo="ia2c",
        env="lbforaging:Foraging-8x8-2p-3f-v3",
        time_limit=25,
        overrides=[
            "algorithm.parallel_envs=8192",
            "algorithm.rollout_early_exit=off",  # +5.9% (see idqn_lbf note)
        ],
    ),
    "vdn_shared_lbf10": dict(
        algo="vdn",
        env="lbforaging:Foraging-10x10-3p-3f-v3",
        time_limit=25,
        overrides=[
            "algorithm.model.parameter_sharing=true",
            # Round-5 retune (quiet box): 16384 -> 32768 envs = 33.8M ->
            # 39.5M steps/s (+17%); 65536 plateaus (39.0M)
            "algorithm.parallel_envs=32768",
            "algorithm.batch_size=512",
            "algorithm.updates_per_collect=8",
            "algorithm.buffer_size=65536",
            "algorithm.training_start=0",
            "algorithm.replay_slot_reuse=clear",  # see idqn_lbf note
            "algorithm.rollout_early_exit=off",  # parity/+0.5% (idqn_lbf note)
        ],
    ),
    "qmix_rware": dict(
        algo="qmix",
        env="rware-tiny-2ag-v2",
        time_limit=500,
        overrides=[
            # Round-5 retune (quiet box): 4096 -> 8192 envs = 33.2M ->
            # 39.0M steps/s (+18%); 16384 exceeds HBM (T=500 rollout
            # buffers). The 65536-style retune that bought SMAClite 2.3x
            # is capped here by episode length.
            "algorithm.parallel_envs=8192",
            "algorithm.batch_size=128",
            "algorithm.updates_per_collect=8",
            "algorithm.buffer_size=16384",
            "algorithm.training_start=0",
            "algorithm.replay_slot_reuse=clear",  # see idqn_lbf note
            # RWARE episodes always run the full T=500 (no terminal state):
            # the early-exit check never fires and costs 5.5%
            "algorithm.rollout_early_exit=off",
        ],
    ),
    "qmix_smaclite_3m": dict(
        algo="qmix",
        env="smaclite:3m-v0",
        time_limit=60,
        overrides=[
            # Round-4 retune AFTER the early-exit rollout: the lane is
            # op-OVERHEAD bound (HBM util ~4%), so envs-per-chip amortise
            # the fixed per-step kernel chain — 16384: 13.0M, 24576: 13.4M,
            # 32768: 13.6M, 65536: **27.9M** steps/s (reproduced 27.5M;
            # round 3's "32768 worse" predates the early exit). buffer ==
            # E: each collect replaces the whole ring, which XLA elides to
            # a buffer swap.
            "algorithm.parallel_envs=65536",
            "algorithm.batch_size=256",
            "algorithm.updates_per_collect=8",
            "algorithm.buffer_size=65536",
            "algorithm.training_start=0",
            "algorithm.replay_slot_reuse=clear",  # see idqn_lbf note
        ],
    ),
    # Compute-dominant config (VERDICT r3 weak #5): MMM2 (10 allies vs 12
    # enemies, 3 unit types), 512-unit GRU policies with parameter sharing,
    # bf16 matmul compute — the regime where the MXU actually engages
    # (per-timestep GRU matmul is (E*10, 512) @ (512, 1536)). Throughput in
    # env-steps/s is NOT the point here; MFU is.
    "qmix_smaclite_mmm2_big": dict(
        algo="qmix",
        env="smaclite:MMM2-v0",
        time_limit=120,
        overrides=[
            "algorithm.model.use_rnn=true",
            "algorithm.model.layers=[512,512]",
            "algorithm.model.parameter_sharing=true",
            "algorithm.model.dtype=bfloat16",
            "algorithm.parallel_envs=2048",
            # Round-5 profile (scripts/diag/mmm2_lane_profile.py, quiet
            # box): the iteration is UPDATE-dominated (82-88%), and the
            # update phase's MFU rises with batch until HBM runs out —
            # B=128: upd 55.9% / overall 51.9%; B=256: upd 62.9% /
            # overall 59.0%; B>=384: OOM (the 121-step BPTT working set).
            # The remainder is the serial scan chains: rollout carries
            # (E*N, 512) through T sequential GRU steps at ~31% MFU, and
            # the update BPTTs B*N rows through the same chain fwd+bwd.
            "algorithm.batch_size=256",
            "algorithm.updates_per_collect=8",
            "algorithm.buffer_size=2048",
            "algorithm.training_start=0",
            "algorithm.replay_slot_reuse=clear",
        ],
    ),
    # AC-family compute-dominant config (VERDICT r4 item 4): same MMM2
    # scale as the QMIX config above but through the ON-POLICY update path —
    # PPO epochs + centralised critic over the whole (T, E) batch, shared
    # 2x512 GRU actor, bf16. Proves the AC update path's compute story with
    # analytic MFU the way qmix_smaclite_mmm2_big does for the DQN family.
    "mappo_smaclite_mmm2_big": dict(
        algo="mappo",
        env="smaclite:MMM2-v0",
        time_limit=120,
        overrides=[
            "algorithm.model.actor.use_rnn=true",
            "algorithm.model.actor.layers=[512,512]",
            "algorithm.model.actor.parameter_sharing=true",
            "algorithm.model.actor.dtype=bfloat16",
            "algorithm.model.critic.use_rnn=true",
            "algorithm.model.critic.layers=[512,512]",
            "algorithm.model.critic.parameter_sharing=true",
            "algorithm.model.critic.dtype=bfloat16",
            # E=512 exceeds HBM (the 4-epoch PPO BPTT holds (T, N, E, H)
            # f32 activation chains for actor AND centralised critic:
            # ~27.5G vs 15.75G); E=256 fits and measures 56.7% MFU
            # (round-5 quiet-box, 3 windows)
            "algorithm.parallel_envs=256",
        ],
    ),
    # Reference-shape throughput config (VERDICT r4 item 6): every other
    # throughput config benches a best-case shape nobody trains
    # (training_start=0, updates_per_collect=8, buffer == collect width,
    # clean slot reuse). This one keeps the reference's training semantics —
    # slot-reuse quirk ON (the default), training_start=2000, batch_size=32,
    # ONE update per collect (the reference's 1-update-per-episode cadence,
    # dqn/train.py:305-311), buffer (16384 episodes) >> collect width — so
    # the suite bounds REALISTIC training throughput, not only the tuned
    # lane. Collect width 1024 is the only concession to the vector rollout.
    "idqn_lbf_refshape": dict(
        algo="idqn",
        env="lbforaging:Foraging-8x8-2p-3f-v3",
        time_limit=25,
        overrides=[
            "algorithm.parallel_envs=1024",
            "algorithm.rollout_early_exit=off",  # LBF (see idqn_lbf note)
            "algorithm.batch_size=32",
            "algorithm.updates_per_collect=1",
            "algorithm.buffer_size=16384",
            "algorithm.training_start=2000",
        ],
    ),
    # Recurrent IDQN: BPTT through the GRU over whole episodes, B=1024
    # (the round-3 tuned batch — B=2048 measured 18.7M steps/s vs 25.8M+
    # at 1024: bigger batches buy nothing at this lane's metric). Round-4
    # finding: XLA's scan is genuinely optimal for this update shape — the
    # redesigned interleaved kernel wins an isolated single-layer BPTT
    # strip (+14% at B=2048) but LOSES end-to-end under the vmapped
    # per-agent update (15.4M vs scan 18.7M at B=2048), so fused_rnn=auto
    # resolves to scan and the _scan twin documents the parity.
    "idqn_rnn_lbf": dict(
        algo="idqn",
        env="lbforaging:Foraging-8x8-2p-3f-v3",
        time_limit=25,
        overrides=[
            "algorithm.model.use_rnn=true",
            "algorithm.rollout_early_exit=off",  # LBF (see idqn_lbf note)
            # round-5 retune: 32768 -> 65536 envs = 25.8M -> 29.8M (+16%)
            "algorithm.parallel_envs=65536",
            "algorithm.batch_size=1024",
            "algorithm.updates_per_collect=8",
            "algorithm.buffer_size=131072",
            "algorithm.training_start=0",
            "algorithm.replay_slot_reuse=clear",  # see idqn_lbf note
        ],
    ),
    # Identical sizes with the kernel disabled — BENCH records the
    # fused-vs-scan delta directly (VERDICT r2 item 4).
    "idqn_rnn_lbf_scan": dict(
        algo="idqn",
        env="lbforaging:Foraging-8x8-2p-3f-v3",
        time_limit=25,
        overrides=[
            "algorithm.model.use_rnn=true",
            "algorithm.model.fused_rnn=off",
            "algorithm.rollout_early_exit=off",  # LBF (see idqn_lbf note)
            "algorithm.parallel_envs=65536",  # matched to idqn_rnn_lbf
            "algorithm.batch_size=1024",
            "algorithm.updates_per_collect=8",
            "algorithm.buffer_size=131072",
            "algorithm.training_start=0",
            "algorithm.replay_slot_reuse=clear",  # see idqn_lbf note
        ],
    ),
}


def _fwd_macs_per_row(input_size: int, hidden: tuple, output_size: int, use_rnn) -> int:
    """Matmul MACs for ONE agent-row through the net (one timestep).

    MLP: in->h1->...->out. RNN (`models/networks.py:RNNSpec.apply`): first
    Linear in->H, L GRU/LSTM layers (w_ih H x gH + w_hh H x gH; g=3 for GRU,
    4 for LSTM), final Linear H->out."""
    if not use_rnn:
        dims = (input_size,) + tuple(hidden) + (output_size,)
        return sum(a * b for a, b in zip(dims[:-1], dims[1:]))
    H = hidden[0]
    g = 4 if str(use_rnn).lower() == "lstm" else 3
    return input_size * H + len(hidden) * (H * g * H * 2) + H * output_size


def analytic_flops(env, acfg, time_limit: int, n_updates: int):
    """Matmul-only useful-FLOPs model — the honest MFU numerator.

    Returns (rollout_flops_per_env_step, update_flops_per_iteration) or
    None for the AC family. MFU counts USEFUL model flops: the rollout term
    is per *collected* env step (finished/early-exited envs' padding work is
    real execution but not model throughput — `collect_episodes` early-exit
    makes most of it vanish anyway), and each update runs online fwd +
    target fwd + backward (~2x fwd) over (T+1) x batch rows.

    Exists because XLA's cost analysis counts a `lax.scan`/while body ONCE,
    not x length, so the compiled-chunk "flops" field under-counts rollouts
    by ~T x and updates by ~n_updates x (this skewed every round-3 MFU
    figure; VERDICT r3 weak #5).
    """
    model_cfg = acfg.model
    name = model_cfg.get("name", "qnetwork")
    if name in ("a2c", "ppo"):
        return _ac_analytic_flops(env, acfg, time_limit)
    if name not in ("qnetwork", "vdn", "qmix"):
        return None
    hidden = tuple(model_cfg.layers)
    use_rnn = model_cfg.use_rnn
    per_row = sum(
        _fwd_macs_per_row(env.obs_dims[i], hidden, env.action_dims[i], use_rnn)
        for i in range(env.n_agents)
    )
    T = time_limit
    B = int(acfg.batch_size)
    rollout_per_step = per_row * 2
    update = n_updates * B * (T + 1) * per_row * 2 * 4  # online+target+bwd(2x)
    if name == "qmix":
        mx = model_cfg.mixing
        S = sum(env.obs_dims)
        emb, hemb = int(mx.embed_dim), int(mx.hypernet_embed)
        N = env.n_agents
        layered = int(mx.hypernet_layers) >= 2
        hw1 = (S * hemb + hemb * N * emb) if layered else S * N * emb
        hw2 = (S * hemb + hemb * emb) if layered else S * emb
        per_tb = hw1 + hw2 + S * emb + (S * emb + emb) + (N * emb + emb)
        # 4x one mixer forward: online fwd (1) + backward (2) + target fwd
        # (1, stop_gradient — no backward). The round-4 code multiplied by a
        # further 2 "for the target mixer", double-counting it (ADVICE r4).
        update += n_updates * B * T * per_tb * 2 * 4
    return float(rollout_per_step), float(update)


def _ac_analytic_flops(env, acfg, time_limit: int):
    """AC-family (a2c/ppo) analytic matmul count.

    Rollout: one actor forward per collected env step. Update (once per
    iteration over the whole (T, E) batch): target-critic bootstrap forward
    over T+1 rows, then `num_epochs` x (actor fwd+bwd + critic fwd+bwd,
    ~3x a forward each) over T rows (`algos/ac.py`; reference
    ac/model.py:189-246, :297-334)."""
    model_cfg = acfg.model
    hidden_a = tuple(model_cfg.actor.layers)
    hidden_c = tuple(model_cfg.critic.layers)
    centralised = bool(model_cfg.critic.centralised)
    rnn_a = model_cfg.actor.use_rnn
    rnn_c = model_cfg.critic.use_rnn
    actor_row = sum(
        _fwd_macs_per_row(env.obs_dims[i], hidden_a, env.action_dims[i], rnn_a)
        for i in range(env.n_agents)
    )
    critic_in = [sum(env.obs_dims)] * env.n_agents if centralised else env.obs_dims
    critic_row = sum(
        _fwd_macs_per_row(critic_in[i], hidden_c, 1, rnn_c)
        for i in range(env.n_agents)
    )
    T = time_limit
    E = int(acfg.get("parallel_envs", 1))
    epochs = int(acfg.get("num_epochs", 1)) if model_cfg.get("name") == "ppo" else 1
    rollout_per_step = actor_row * 2
    update = (T + 1) * E * critic_row * 2  # target-critic bootstrap fwd
    update += epochs * T * E * (actor_row + critic_row) * 2 * 3  # fwd+bwd(2x)
    return float(rollout_per_step), float(update)


def chip_peak_flops() -> float | None:
    kind = jax.devices()[0].device_kind
    return PEAK_FLOPS.get(kind)


def chip_peak_bandwidth() -> float | None:
    kind = jax.devices()[0].device_kind
    return PEAK_HBM_BW.get(kind)


def run_config(key: str, windows: int = 3, window_iters: int = 16) -> dict:
    """Measure one config. Returns env-steps/s, FLOPs/s, and MFU."""
    from codebase_tpu.algos.dqn import build_train_functions as build_dqn
    from codebase_tpu.algos.ac import build_train_functions as build_ac
    from codebase_tpu.profile import DQN_FAMILY
    from codebase_tpu.config import load_config
    from codebase_tpu.envs.factory import make_env
    from codebase_tpu.utils import profiling

    spec = CONFIGS[key]
    cfg = load_config(
        [f"+algorithm={spec['algo']}"]
        + [f"env.name={spec['env']}", f"env.time_limit={spec['time_limit']}"]
        + spec["overrides"]
    )
    env_cfg = cfg.env.to_dict()
    env_cfg.pop("parallel_envs", None)
    env = make_env(env_cfg.pop("name"), **env_cfg)

    build = build_dqn if spec["algo"] in DQN_FAMILY else build_ac
    _, init_state, train_chunk, _ = build(
        env, env, cfg.algorithm, spec["time_limit"]
    )
    state = init_state(jax.random.PRNGKey(0))

    n_envs = int(cfg.algorithm.get("parallel_envs", 1))
    upc = cfg.algorithm.get("updates_per_collect", "auto")
    n_updates = n_envs if upc == "auto" else int(upc)
    analytic = analytic_flops(env, cfg.algorithm, spec["time_limit"], n_updates)

    # one compile serves analysis and timing
    chunk, costs, _ = profiling.compile_and_analyze(
        lambda s: train_chunk(s, window_iters)[0], state
    )
    flops_per_chunk = float(costs.get("flops", 0.0))
    bytes_per_chunk = float(costs.get("bytes accessed", 0.0))

    state = chunk(state)  # warmup execution
    # device_get (NOT int()): int() on a fresh traced output takes a ~50s
    # slow path over the axon tunnel; device_get syncs cleanly
    s0 = int(jax.device_get(state.env_steps))

    best_rate, best_dt, best_steps = 0.0, float("inf"), 1
    for _ in range(windows):
        t0 = time.time()
        state = chunk(state)
        jax.block_until_ready(state)  # timing sync
        dt = time.time() - t0
        steps = int(jax.device_get(state.env_steps)) - s0  # fetched UNtimed
        s0 = steps + s0
        if steps / dt > best_rate:
            best_rate, best_dt, best_steps = steps / dt, dt, steps

    peak = chip_peak_flops()
    peak_bw = chip_peak_bandwidth()
    # compiled-chunk flops: XLA cost analysis counts scan bodies once (NOT
    # x length) — kept only as a lower-bound diagnostic. MFU uses the
    # analytic matmul count (see `analytic_flops`) when available.
    flops_per_s = flops_per_chunk / best_dt if flops_per_chunk else None
    bytes_per_s = bytes_per_chunk / best_dt if bytes_per_chunk else None
    if analytic:
        roll_per_step, upd_per_iter = analytic
        # useful model flops in the best window: rollout counts only
        # COLLECTED steps (early-exited padding is not model throughput)
        analytic_window = roll_per_step * best_steps + upd_per_iter * window_iters
        analytic_per_s = analytic_window / best_dt
    else:
        analytic_window = analytic_per_s = None
    mfu_src = "analytic_matmul" if analytic_per_s else "compiled_lower_bound"
    mfu_flops = analytic_per_s or flops_per_s
    out = {
        "config": key,
        "algo": spec["algo"],
        "env": spec["env"],
        "env_steps_per_s": round(best_rate, 1),
        "flops_per_step": round(flops_per_chunk / max(steps, 1), 1)
        if flops_per_chunk
        else None,
        "analytic_flops_per_step": round(analytic_window / max(best_steps, 1), 1)
        if analytic_window
        else None,
        "bytes_per_step": round(bytes_per_chunk / max(steps, 1), 1)
        if bytes_per_chunk
        else None,
        "device_flops_per_s": round(mfu_flops, 1) if mfu_flops else None,
        "mfu": round(mfu_flops / peak, 5) if (mfu_flops and peak) else None,
        "mfu_source": mfu_src,
        # roofline: fraction of peak HBM bandwidth sustained (the binding
        # resource for elementwise-heavy RL training; see PEAK_HBM_BW note).
        # The bytes numerator is the compiled-chunk cost analysis and shares
        # its scan-body under-count — treat as a lower bound.
        "hbm_bandwidth_util": round(bytes_per_s / peak_bw, 4)
        if (bytes_per_s and peak_bw)
        else None,
        "device_kind": jax.devices()[0].device_kind,
    }
    return out


def run_suite(only=None, windows: int = 3) -> dict:
    results = {}
    for key in CONFIGS:
        if only and key != only:
            continue
        results[key] = run_config(key, windows=windows)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", choices=sorted(CONFIGS), default=None)
    ap.add_argument("--windows", type=int, default=3)
    args = ap.parse_args()

    from codebase_tpu.utils.compilation_cache import enable as enable_cache

    enable_cache()
    for key, res in run_suite(args.only, args.windows).items():
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
