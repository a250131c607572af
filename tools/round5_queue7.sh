#!/bin/bash
# Round-5 queue 7: FINAL held-out greenhouse-multi claim — ours-side
# champion variant (retrieval_s1_rd0p3_rs4: unit-scale retrieval + 0.3
# damped rotation tangents + 4-start selective rescue) on the 8 FRESH
# seeds, reusing each seed's genuine reference rows from the queue-4 runs
# (--reuse-ref; dataset generation is seed-deterministic). Serialized
# after queues 3, 4 and 6.
set -u
cd /root/repo
EV=docs/evidence/round5
mkdir -p $EV/logs

for P in /tmp/queue3.pid /tmp/queue4.pid /tmp/queue6.pid; do
  while pid=$(cat $P 2>/dev/null) && [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null; do
    sleep 30
  done
done
sleep 10

run() {
  local name=$1; shift
  echo "=== $name START $(date -u +%H:%M:%S) ===" | tee -a $EV/logs/queue7.log
  "$@" > $EV/logs/$name.log 2>&1
  echo "=== $name DONE rc=$? $(date -u +%H:%M:%S) ===" | tee -a $EV/logs/queue7.log
}

for S in 1301 1404 1507 1613 1702 1805 1904 2001; do
  ref=$EV/h2h_gh_fresh_rs4_s$S.json
  [ -f "$ref" ] || { echo "missing $ref, skipping" | tee -a $EV/logs/queue7.log; continue; }
  run gh_fresh_rd0p3_rs4_s$S python tools/reference_head2head_lab.py \
    --family greenhouse --multi --n-fruits 16 --seed $S \
    --variant retrieval_s1_rd0p3_rs4 \
    --reuse-ref $ref \
    --json-out $EV/h2h_gh_fresh_rd0p3_rs4_s$S.json
done

echo "=== QUEUE7 COMPLETE $(date -u +%H:%M:%S) ===" | tee -a $EV/logs/queue7.log
