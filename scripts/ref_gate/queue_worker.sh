#!/bin/bash
# Pops one job line at a time from a shared queue file (flock-serialised) and
# runs it. Used to drive the round-4 reference-side gate runs on the 2-core
# box: 2 workers, torch pinned to 1 thread each (as the reference does).
# Usage: queue_worker.sh <queue-file> <log-dir> <worker-id>
set -u
QUEUE="$1"; LOGDIR="$2"; WID="$3"
mkdir -p "$LOGDIR"
while true; do
  JOB=$(flock "$QUEUE" bash -c "head -n 1 '$QUEUE'; sed -i '1d' '$QUEUE'")
  [ -z "$JOB" ] && break
  TAG=$(echo "$JOB" | md5sum | cut -c1-8)
  echo "[worker $WID] $(date +%H:%M:%S) start: $JOB" >> "$LOGDIR/worker$WID.log"
  bash -c "$JOB" >> "$LOGDIR/job_${TAG}.log" 2>&1
  echo "[worker $WID] $(date +%H:%M:%S) done rc=$?: $JOB" >> "$LOGDIR/worker$WID.log"
done
echo "[worker $WID] $(date +%H:%M:%S) queue empty" >> "$LOGDIR/worker$WID.log"
