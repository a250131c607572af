#!/bin/bash
# Round-5 queue 5: remaining FRESH greenhouse-multi seeds (full genuine
# reference side), serialized AFTER queue 3 — two concurrent TPU processes
# thrash the axon tunnel (each dispatch round trip is 30-250 ms and they
# interleave), so TPU-heavy studies must run one at a time.
set -u
cd /root/repo
EV=docs/evidence/round5
mkdir -p $EV/logs

# wait for queue 3 (pid in /tmp/queue3.pid) and the in-flight s1301 run
while kill -0 "$(cat /tmp/queue3.pid 2>/dev/null)" 2>/dev/null; do sleep 30; done
while pgrep_pid=$(cat /tmp/s1301.pid 2>/dev/null) && [ -n "$pgrep_pid" ] \
      && kill -0 "$pgrep_pid" 2>/dev/null; do sleep 30; done

run() {
  local name=$1; shift
  echo "=== $name START $(date -u +%H:%M:%S) ===" | tee -a $EV/logs/queue5.log
  "$@" > $EV/logs/$name.log 2>&1
  echo "=== $name DONE rc=$? $(date -u +%H:%M:%S) ===" | tee -a $EV/logs/queue5.log
}

for S in 1404 1507 1613 1702 1805 1904 2001; do
  run gh_fresh_s$S python tools/reference_head2head_lab.py \
    --family greenhouse --multi --n-fruits 16 --seed $S \
    --variant retrieval_s1_rs4 \
    --json-out $EV/h2h_gh_fresh_rs4_s$S.json
done

echo "=== QUEUE5 COMPLETE $(date -u +%H:%M:%S) ===" | tee -a $EV/logs/queue5.log
