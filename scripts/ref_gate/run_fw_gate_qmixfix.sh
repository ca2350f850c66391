#!/bin/bash
# Round-4 QMIX gate rerun with the reference clip scope (critic-only
# global-norm clipping; the mixer's gradients pass unclipped — see the
# "QMIX gate divergence diagnosed and fixed" commit and
# scripts/diag/qmix_update_parity.py). Same budgets/seeds as the original
# round-4 qmix runs (1M steps, seeds 0-4).
cd /root/repo
mkdir -p outputs/fw_gate_r4_fix
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
  local dir=outputs/fw_gate_r4_fix/${algo}_seed${seed}
  [ -f "$dir/results.csv" ] && { echo "skip $dir (exists)"; return; }
  for attempt in 1 2 3; do
    rm -rf "$dir"
    echo "$(date +%H:%M:%S) start fix $algo seed $seed (attempt $attempt)"
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
        echo "$(date +%H:%M:%S) WEDGED fix $algo seed $seed: killing $pid"
        local cpid=$(pgrep -P $pid)
        kill $pid $cpid 2>/dev/null; sleep 3
        kill -9 $cpid 2>/dev/null
        sleep 75; probe || echo "$(date +%H:%M:%S) tunnel still dead"
        continue 2
      fi
    done
    wait $pid; local rc=$?
    if [ -f "$dir/results.csv" ] && [ $rc -eq 0 ]; then
      echo "$(date +%H:%M:%S) done fix $algo seed $seed rc=$rc"
      sleep 10
      return
    fi
    echo "$(date +%H:%M:%S) FAILED fix $algo seed $seed rc=$rc; retrying"
    sleep 75; probe
  done
  echo "$(date +%H:%M:%S) GIVING UP on fix $algo seed $seed"
}
for s in 0 1 2 3 4; do run qmix $s env.parallel_envs=1 algorithm.total_steps=1000000; done
echo "$(date +%H:%M:%S) QMIX FIX RERUN DONE"
