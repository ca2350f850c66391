#!/bin/bash
# Round-5 framework-side gate runs, sequential (ONE TPU process at a time —
# the axon tunnel wedges concurrent TPU sessions; see run_fw_gate_r4.sh).
#
# Round-5 gate matrix (VERDICT r4 "next round" items 1, 3, 7):
#   - qmix + vdn on smaclite:3m-v0 (action-mask training path, end-to-end)
#   - ippo/maa2c seeds 5-9 on LBF (extend the low-side-lean families to n=10)
#   - ia2c on rware-tiny-2ag-v2 (second env family cross-check)
# Hyperparameters identical to the reference side driven by
# scripts/ref_gate/run_ref_gate.py (see outputs/ref_gate_r5/queue.txt).
cd /root/repo
mkdir -p outputs/fw_gate_r5
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
  local tag=$1 algo=$2 seed=$3; shift 3
  local dir=outputs/fw_gate_r5/${tag}_seed${seed}
  [ -f "$dir/results.csv" ] && { echo "skip $dir (exists)"; return; }
  for attempt in 1 2 3; do
    rm -rf "$dir"
    echo "$(date +%H:%M:%S) start $tag seed $seed (attempt $attempt)"
    timeout 7200 python -m codebase_tpu.run +algorithm=$algo \
      seed=$seed algorithm.eval_interval=20000 algorithm.log_interval=20000 \
      "$@" run_dir=$dir > $dir.log 2>&1 &
    local pid=$!
    local waited=0
    while kill -0 $pid 2>/dev/null; do
      sleep 20; waited=$((waited+20))
      if [ ! -f "$dir/results.csv" ] && [ $waited -ge $STALL_S ]; then
        echo "$(date +%H:%M:%S) WEDGED $tag seed $seed (no results after ${waited}s): killing $pid"
        local cpid=$(pgrep -P $pid)   # timeout's direct python child, by exact PPID
        kill $pid $cpid 2>/dev/null; sleep 3
        kill -9 $cpid 2>/dev/null
        sleep 75; probe || echo "$(date +%H:%M:%S) tunnel still dead"
        continue 2
      fi
    done
    wait $pid; local rc=$?
    if [ -f "$dir/results.csv" ] && [ $rc -eq 0 ]; then
      echo "$(date +%H:%M:%S) done $tag seed $seed rc=$rc"
      sleep 10
      return
    fi
    echo "$(date +%H:%M:%S) FAILED $tag seed $seed rc=$rc; retrying"
    sleep 75; probe
  done
  echo "$(date +%H:%M:%S) GIVING UP on $tag seed $seed"
}

SMAC="env.name=smaclite:3m-v0 env.time_limit=60 env.parallel_envs=1 algorithm.total_steps=1000000"
LBF="env.name=Foraging-8x8-2p-3f-v3 env.time_limit=25 algorithm.total_steps=2000000"
RWARE="env.name=rware-tiny-2ag-v2 env.time_limit=500 algorithm.total_steps=2000000"

for s in 0 1 2 3 4; do run qmix_smaclite qmix $s $SMAC; done
for s in 5 6 7 8 9; do run ippo ippo $s $LBF; done
for s in 5 6 7 8 9; do run maa2c maa2c $s $LBF; done
for s in 0 1 2 3 4; do run ia2c_rware ia2c $s $RWARE; done
for s in 0 1 2 3 4; do run vdn_smaclite vdn $s $SMAC; done
echo "$(date +%H:%M:%S) ALL DONE"
