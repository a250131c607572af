#!/bin/bash
# Round-5 study queue part 2 (chained after round5_queue.sh): greenhouse
# rescue held-out eval (reuses round-4 genuine reference rows), berry
# trainer gate, full-dispatch roofline.
set -u
cd /root/repo
EV=docs/evidence/round5
mkdir -p $EV/logs

# wait for queue 1 (pid in /tmp/queue.pid) to finish
if [ -f /tmp/queue.pid ]; then
  P=$(cat /tmp/queue.pid)
  while kill -0 "$P" 2>/dev/null; do sleep 30; done
fi

run() {
  local name=$1; shift
  echo "=== $name START $(date -u +%H:%M:%S) ===" | tee -a $EV/logs/queue.log
  "$@" > $EV/logs/$name.log 2>&1
  echo "=== $name DONE rc=$? $(date -u +%H:%M:%S) ===" | tee -a $EV/logs/queue.log
}

# Selective multi-start rescue (rs4, a-priori defaults: rescue_cost_z=3)
# on the round-4 held-out greenhouse-multi seeds, reusing the stored
# genuine reference rows (ours-side only => TPU, fast).
for S in 301 404 512 613 701 808 905 1013 1106 1207; do
  run gh_rs4_s$S python tools/reference_head2head_lab.py \
    --family greenhouse --multi --n-fruits 16 --seed $S \
    --variant retrieval_s1_rs4 \
    --reuse-ref docs/evidence/round4/h2h_gh_s1_s$S.json \
    --json-out $EV/h2h_gh_rs4_s$S.json
done

# Trainer second-category gate: strawberry spec (ClampingDistance 0.05,
# berry scale) at full size on the real chip.
run train_gate_berry python tools/train_quality_gate.py --category berry

# Full bench dispatch roofline (solve + SDF grids + packed fetch).
run roofline_grids python tools/roofline.py --n-fruits 32 --reps 8 \
  --with-grids --json-out $EV/roofline_full_b32.json

echo "=== QUEUE2 COMPLETE $(date -u +%H:%M:%S) ===" | tee -a $EV/logs/queue.log
