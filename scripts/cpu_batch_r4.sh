#!/bin/bash
# Round-4 CPU batch: waits for chip batch 2 to finish (the 2 vCPUs must
# not contend with chip timing loops — CLAUDE.md serialization rule),
# then runs the CPU-side round-4 evidence jobs.
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=result/cpu_batch_r4.log
: > "$OUT"

for i in $(seq 1 960); do
  grep -q "^DONE" result/chip_batch5_r4.jsonl.log 2>/dev/null && break
  sleep 30
done

echo "=== full test suite ($(date +%H:%M:%S))" >> "$OUT"
timeout 3600 python -m pytest tests/ -q 2>&1 | grep -v cpu_aot | tail -5 >> "$OUT"

echo "=== sid_sharded_ratio d=32 ($(date +%H:%M:%S))" >> "$OUT"
timeout 1800 python -m riptrm_tpu.experiment.sid_sharded_ratio \
  --d 32 --virtual-devices 8 2>/dev/null | tail -1 >> "$OUT"

echo "=== schulz protocol parity, StableIdentification ($(date +%H:%M:%S))" >> "$OUT"
timeout 3600 python -m riptrm_tpu.experiment.protocol_speedrun \
  --problems StableIdentification --solvers RSQO \
  --option quadoptim_linear_solver=schulz \
  --out result/protocol_rsqo_schulz.json 2>/dev/null | tail -3 >> "$OUT"

echo "DONE $(date +%H:%M:%S)" >> "$OUT"
