#!/bin/bash
# Round-5 queue 3: berry trainer gate (VERDICT item 8), rot-damped rescue
# probes on the STORED round-4 seeds (tuning data — the final claim needs
# fresh seeds), and the full-dispatch roofline.
set -u
cd /root/repo
EV=docs/evidence/round5
mkdir -p $EV/logs

run() {
  local name=$1; shift
  echo "=== $name START $(date -u +%H:%M:%S) ===" | tee -a $EV/logs/queue3.log
  "$@" > $EV/logs/$name.log 2>&1
  echo "=== $name DONE rc=$? $(date -u +%H:%M:%S) ===" | tee -a $EV/logs/queue3.log
}

# Trainer second-category gate: strawberry spec at full size on the chip.
run train_gate_berry python tools/train_quality_gate.py --category berry

# Rot-damped rescue probes, 5 stored seeds x 3 variants (ours-side only).
for S in 301 512 613 808 905; do
  for V in retrieval_s1_rd1 retrieval_s1_rd1_rs4 retrieval_s1_rd0p3_rs4; do
    run gh_${V}_s$S python tools/reference_head2head_lab.py \
      --family greenhouse --multi --n-fruits 16 --seed $S \
      --variant $V \
      --reuse-ref docs/evidence/round4/h2h_gh_s1_s$S.json \
      --json-out $EV/probe_gh_${V}_s$S.json
  done
done

# Full bench dispatch roofline (solve + SDF grids + packed fetch).
run roofline_grids python tools/roofline.py --n-fruits 32 --reps 8 \
  --with-grids --json-out $EV/roofline_full_b32.json

echo "=== QUEUE3 COMPLETE $(date -u +%H:%M:%S) ===" | tee -a $EV/logs/queue3.log
