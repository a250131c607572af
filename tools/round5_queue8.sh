#!/bin/bash
# Round-5 queue 8: PRE-REGISTERED extension of the strawberry-category
# genuine head-to-head (docs/PERF.md round-5 berry section). The N=16
# pooled result is parity with the edge on our side (-0.069 +/- 0.056 mm,
# -1.2 sems). Extension: FOUR fresh seeds (59/61/73/89) x 8 fruits = +32
# instances, pooled with the existing s31/s47 runs to N=48. Decision rule
# fixed in advance: claim a win only if |pooled mean| >= 2 sem; ALL runs
# are reported regardless of outcome (no selection).
set -u
cd /root/repo
EV=docs/evidence/round5
mkdir -p $EV/logs

run() {
  local name=$1; shift
  echo "=== $name START $(date -u +%H:%M:%S) ===" | tee -a $EV/logs/queue8.log
  "$@" > $EV/logs/$name.log 2>&1
  echo "=== $name DONE rc=$? $(date -u +%H:%M:%S) ===" | tee -a $EV/logs/queue8.log
}

for S in 59 61 73 89; do
  run berry_lab_s$S python tools/reference_head2head_lab.py \
    --family lab --category berry --n-fruits 8 --seed $S --multi \
    --variant retrieval_s1 --json-out $EV/h2h_lab_berry_s$S.json
done

echo "=== QUEUE8 COMPLETE $(date -u +%H:%M:%S) ===" | tee -a $EV/logs/queue8.log
