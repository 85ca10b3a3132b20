#!/bin/bash
# Round-4 chip batch 5: segmented long-horizon StableId d=32 (the
# 2-minute single-call worker limit forces run_sweep_checkpointed).
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=result/chip_batch5_r4.jsonl
: > "$OUT"

for i in $(seq 1 960); do
  grep -q "^DONE" result/chip_batch4_r4.jsonl.log 2>/dev/null && break
  sleep 30
done

echo "=== sid32_longrun ($(date +%H:%M:%S))" >> "$OUT.log"
timeout 3600 python scripts/sid32_longrun.py --batch 8 --max-steps 24000 \
  2>>"$OUT.log" | tee -a "$OUT"

echo "DONE $(date +%H:%M:%S)" >> "$OUT.log"
