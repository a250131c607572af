#!/bin/bash
# Round-5 queue 2a: greenhouse selective-rescue held-out eval (ours-side
# TPU, reusing round-4 genuine reference rows). Runs CONCURRENTLY with
# queue 1's CPU-bound reference phases — the axon TPU tunnel multiplexes
# processes, and these quality metrics are timing-insensitive.
set -u
cd /root/repo
EV=docs/evidence/round5
mkdir -p $EV/logs

run() {
  local name=$1; shift
  echo "=== $name START $(date -u +%H:%M:%S) ===" | tee -a $EV/logs/queue2a.log
  "$@" > $EV/logs/$name.log 2>&1
  echo "=== $name DONE rc=$? $(date -u +%H:%M:%S) ===" | tee -a $EV/logs/queue2a.log
}

for S in 301 404 512 613 701 808 905 1013 1106 1207; do
  run gh_rs4_s$S nice -n 5 python tools/reference_head2head_lab.py \
    --family greenhouse --multi --n-fruits 16 --seed $S \
    --variant retrieval_s1_rs4 \
    --reuse-ref docs/evidence/round4/h2h_gh_s1_s$S.json \
    --json-out $EV/h2h_gh_rs4_s$S.json
done

echo "=== QUEUE2A COMPLETE $(date -u +%H:%M:%S) ===" | tee -a $EV/logs/queue2a.log
