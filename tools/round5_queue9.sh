#!/bin/bash
# Round-5 queue 9: greenhouse SINGLE-frame damped-rotation probe. The
# round-5 multi-frame result (rot 0.02 vs 44.1 deg at CD/trans parity,
# N=45) should transfer: single-frame ends at ~79 vs 85 deg rot err from
# a GT-rotation init (docs/PERF.md round-3/4 single sections) because one
# view leaves rotation near-unobservable. Tuning probe on seeds 23 + 55:
# full retrieval_s1 runs (genuine reference rows + shipped-ours baseline),
# then rd0p3 re-scored against the same reference rows (--reuse-ref).
# Held-out fresh-seed runs are staged separately AFTER this probe gates.
set -u
cd /root/repo
EV=docs/evidence/round5
mkdir -p $EV/logs

while pid=$(cat /tmp/queue8.pid 2>/dev/null) && [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null; do
  sleep 30
done
sleep 5

run() {
  local name=$1; shift
  echo "=== $name START $(date -u +%H:%M:%S) ===" | tee -a $EV/logs/queue9.log
  "$@" > $EV/logs/$name.log 2>&1
  echo "=== $name DONE rc=$? $(date -u +%H:%M:%S) ===" | tee -a $EV/logs/queue9.log
}

for S in 23 55; do
  run gh_single_s1_s$S python tools/reference_head2head_lab.py \
    --family greenhouse --seed $S \
    --variant retrieval_s1 --json-out $EV/h2h_gh_single_s1_s$S.json
  run gh_single_s1_rd0p3_s$S python tools/reference_head2head_lab.py \
    --family greenhouse --seed $S \
    --variant retrieval_s1_rd0p3 \
    --reuse-ref $EV/h2h_gh_single_s1_s$S.json \
    --json-out $EV/h2h_gh_single_s1_rd0p3_s$S.json
done

echo "=== QUEUE9 COMPLETE $(date -u +%H:%M:%S) ===" | tee -a $EV/logs/queue9.log
