#!/bin/bash
# Round-5 CPU-heavy study queue (serialized: this host has ONE core).
# Each step logs to docs/evidence/round5/logs/ and writes JSON evidence.
set -u
cd /root/repo
EV=docs/evidence/round5
mkdir -p $EV/logs

run() {  # run <name> <cmd...>
  local name=$1; shift
  echo "=== $name START $(date -u +%H:%M:%S) ===" | tee -a $EV/logs/queue.log
  "$@" > $EV/logs/$name.log 2>&1
  echo "=== $name DONE rc=$? $(date -u +%H:%M:%S) ===" | tee -a $EV/logs/queue.log
}

# Wild pose-noise head-to-head, 3 fresh seed sets (tuning was seed 1000,
# round-4 single run was seed 0). Extras: scale-fix alone + shipped
# noisy-init variant (rot_damp 1.0 + annealed coarse scale damp).
for S in 100 200 300; do
  run wild_pose_s$S python tools/reference_head2head_wild.py \
    --n-fruits 8 --pose-noise --base-seed $S \
    --extra cs0p1_sd0p01,rd1_cs0p1_sd0p01 \
    --json-out $EV/wild_pose_s$S.json
done

# Strawberry-category genuine lab head-to-head: 2 seeds x 8 fruits = N=16
# (multi-frame, TPU ours-side — the round-4 lab-pepper methodology).
for S in 31 47; do
  run berry_lab_s$S python tools/reference_head2head_lab.py \
    --family lab --category berry --n-fruits 8 --seed $S --multi \
    --variant retrieval_s1 --json-out $EV/h2h_lab_berry_s$S.json
done

echo "=== QUEUE COMPLETE $(date -u +%H:%M:%S) ===" | tee -a $EV/logs/queue.log
