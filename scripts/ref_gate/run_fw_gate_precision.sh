#!/bin/bash
# QMIX gate-divergence diagnosis (round 4): rerun the framework side with
# f32 matmuls forced EXACT (jax_default_matmul_precision=highest).
#
# Motivation: fw QMIX partially lifts off on 3 of 5 seeds (0.069 +/- 0.047)
# while the reference's torch-CPU QMIX never does (0.032 +/- 0.003). The
# agent nets and update chain are parity-proven for IDQN (which matches), so
# the remaining fw-only degree of freedom on this path is TPU matmul
# internals: XLA's default f32 matmul on TPU rounds through bf16 passes,
# while torch CPU computes true f32. The QMIX hypernetwork's multiplicative
# two-level structure is exactly where such rounding acts like extra
# exploration noise. If highest-precision fw runs collapse onto the
# reference's flat curves, the divergence is attributed; if they stay
# lifted, precision is exonerated.
cd /root/repo
mkdir -p outputs/fw_gate_r4_hp
STALL_S=1500

probe() {
  for i in 1 2 3 4 5; do
    timeout 180 python -c "
import jax, jax.numpy as jnp
jax.jit(lambda a: a*2)(jnp.ones((8,8))).block_until_ready()
print('probe ok')" && return 0
    echo "$(date +%H:%M:%S) probe $i failed; waiting 60s"
    sleep 60
  done
  return 1
}

run() {
  local algo=$1 seed=$2; shift 2
  local dir=outputs/fw_gate_r4_hp/${algo}_seed${seed}
  [ -f "$dir/results.csv" ] && { echo "skip $dir (exists)"; return; }
  for attempt in 1 2 3; do
    rm -rf "$dir"
    echo "$(date +%H:%M:%S) start hp $algo seed $seed (attempt $attempt)"
    JAX_DEFAULT_MATMUL_PRECISION=highest \
    timeout 3600 python -m codebase_tpu.run +algorithm=$algo \
      env.name=Foraging-8x8-2p-3f-v3 env.time_limit=25 \
      seed=$seed algorithm.total_steps=2000000 \
      algorithm.eval_interval=20000 algorithm.log_interval=20000 \
      "$@" run_dir=$dir > $dir.log 2>&1 &
    local pid=$!
    local waited=0
    while kill -0 $pid 2>/dev/null; do
      sleep 20; waited=$((waited+20))
      if [ ! -f "$dir/results.csv" ] && [ $waited -ge $STALL_S ]; then
        echo "$(date +%H:%M:%S) WEDGED hp $algo seed $seed: killing $pid"
        local cpid=$(pgrep -P $pid)
        kill $pid $cpid 2>/dev/null; sleep 3
        kill -9 $cpid 2>/dev/null
        sleep 75; probe || echo "$(date +%H:%M:%S) tunnel still dead"
        continue 2
      fi
    done
    wait $pid; local rc=$?
    if [ -f "$dir/results.csv" ] && [ $rc -eq 0 ]; then
      echo "$(date +%H:%M:%S) done hp $algo seed $seed rc=$rc"
      sleep 10
      return
    fi
    echo "$(date +%H:%M:%S) FAILED hp $algo seed $seed rc=$rc; retrying"
    sleep 75; probe
  done
  echo "$(date +%H:%M:%S) GIVING UP on hp $algo seed $seed"
}
for s in 0 1 2 3 4; do run qmix $s env.parallel_envs=1 algorithm.total_steps=1000000; done
echo "$(date +%H:%M:%S) HP EXP DONE"
