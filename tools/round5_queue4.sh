#!/bin/bash
# Round-5 queue 4: FRESH greenhouse-multi seeds with the full genuine
# reference side (CPU torch). These produce the held-out validation rows
# for the final rescue claim — the stored round-4 seeds are now tuning
# data (the rd-variant probes ran on them). Ours side runs the current
# champion (rs4); if the probe picks a different variant, re-run ours-side
# with --reuse-ref on these files (cheap).
set -u
cd /root/repo
EV=docs/evidence/round5
mkdir -p $EV/logs

run() {
  local name=$1; shift
  echo "=== $name START $(date -u +%H:%M:%S) ===" | tee -a $EV/logs/queue4.log
  "$@" > $EV/logs/$name.log 2>&1
  echo "=== $name DONE rc=$? $(date -u +%H:%M:%S) ===" | tee -a $EV/logs/queue4.log
}

for S in 1301 1404 1507 1613 1702 1805 1904 2001; do
  run gh_fresh_s$S nice -n 10 python tools/reference_head2head_lab.py \
    --family greenhouse --multi --n-fruits 16 --seed $S \
    --variant retrieval_s1_rs4 \
    --json-out $EV/h2h_gh_fresh_rs4_s$S.json
done

echo "=== QUEUE4 COMPLETE $(date -u +%H:%M:%S) ===" | tee -a $EV/logs/queue4.log
