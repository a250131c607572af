#!/bin/bash
# Round-5 queue 6: berry trainer gate EVAL re-run (training already done,
# checkpoint at data/exp_berry_32_trained_512; the first eval compile-OOMed
# before the mesher's chunked batch decode landed). Serialized after queues
# 3 and 4 — concurrent TPU processes thrash the axon tunnel.
set -u
cd /root/repo
EV=docs/evidence/round5
mkdir -p $EV/logs

for P in /tmp/queue3.pid /tmp/queue4.pid; do
  while pid=$(cat $P 2>/dev/null) && [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null; do
    sleep 30
  done
done
# also wait for any straggler h2h python started by those queues
sleep 10

echo "=== train_gate_berry_eval START $(date -u +%H:%M:%S) ===" | tee -a $EV/logs/queue6.log
python tools/train_quality_gate.py --category berry --skip-train \
  > $EV/logs/train_gate_berry_eval.log 2>&1
echo "=== train_gate_berry_eval DONE rc=$? $(date -u +%H:%M:%S) ===" | tee -a $EV/logs/queue6.log
