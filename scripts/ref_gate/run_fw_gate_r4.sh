#!/bin/bash
# Round-4 framework-side gate runs, sequential (ONE TPU process at a time).
# The axon tunnel wedges a process that starts while another TPU session is
# live (or right after one was killed): a wedged run shows no results.csv
# and ~0 CPU. This driver detects that (no results.csv after $STALL_S),
# kills the exact PID, waits, probes the tunnel with a tiny jit until it
# answers, and retries the run.
cd /root/repo
mkdir -p outputs/fw_gate_r4
STALL_S=1200

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
  local dir=outputs/fw_gate_r4/${algo}_seed${seed}
  [ -f "$dir/results.csv" ] && { echo "skip $dir (exists)"; return; }
  for attempt in 1 2 3; do
    rm -rf "$dir"
    echo "$(date +%H:%M:%S) start $algo seed $seed (attempt $attempt)"
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
        echo "$(date +%H:%M:%S) WEDGED $algo seed $seed (no results after ${waited}s): killing $pid"
        local cpid=$(pgrep -P $pid)   # timeout's direct python child, by exact PPID
        kill $pid $cpid 2>/dev/null; sleep 3
        kill -9 $cpid 2>/dev/null
        sleep 75; probe || echo "$(date +%H:%M:%S) tunnel still dead"
        continue 2
      fi
    done
    wait $pid; local rc=$?
    if [ -f "$dir/results.csv" ] && [ $rc -eq 0 ]; then
      echo "$(date +%H:%M:%S) done $algo seed $seed rc=$rc"
      sleep 10
      return
    fi
    echo "$(date +%H:%M:%S) FAILED $algo seed $seed rc=$rc; retrying"
    sleep 75; probe
  done
  echo "$(date +%H:%M:%S) GIVING UP on $algo seed $seed"
}
# vdn/qmix run 1M steps (matched to the 1M reference-side runs: the DQN
# family reference trainer does ~1.4k FPS, so 2M x 5 seeds x 2 algos did
# not fit the round budget; the gate criterion only needs matched budgets)
for s in 0 1 2 3 4; do run vdn  $s env.parallel_envs=1 algorithm.total_steps=1000000; done
for s in 0 1 2 3 4; do run qmix $s env.parallel_envs=1 algorithm.total_steps=1000000; done
for s in 0 1 2 3 4; do run mappo $s; done
for s in 5 6 7 8 9; do run idqn $s env.parallel_envs=1 algorithm.save_interval=500000; done
for s in 3 4; do run ia2c $s; done
for s in 0 1 2 3 4; do run maa2c $s; done
for s in 0 1 2 3 4; do run ippo $s; done
echo "$(date +%H:%M:%S) ALL DONE"
