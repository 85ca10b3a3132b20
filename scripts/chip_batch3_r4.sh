#!/bin/bash
# Round-4 chip batch 3: staged-precision re-runs with the keep-best-point
# continuation fix (the first runs handed back post-dip churn states).
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=result/chip_batch3_r4.jsonl
: > "$OUT"

for i in $(seq 1 960); do
  grep -q "^DONE" result/chip_batch2_r4.jsonl.log 2>/dev/null && break
  sleep 30
done

run_job() {
  local tag="$1"; shift
  local to="$1"; shift
  echo "=== $tag : $* ($(date +%H:%M:%S))" >> "$OUT.log"
  local line
  line=$(timeout "$to" "$@" 2>>"$OUT.log" | tail -1)
  if [ -n "$line" ]; then
    echo "{\"tag\": \"$tag\", \"result\": $line}" >> "$OUT"
  else
    echo "{\"tag\": \"$tag\", \"result\": null}" >> "$OUT"
  fi
}

CS="python -m riptrm_tpu.experiment.chip_sweep"
run_job staged_fix_n1000_b16 2400 $CS --problem NonnegPCA --size 1000 \
  --batch 16 --staged-precision --staged-tolresid 3e-6
run_job staged_fix_n1000_b128 2400 $CS --problem NonnegPCA --size 1000 \
  --batch 128 --staged-precision --staged-tolresid 3e-6

echo "DONE $(date +%H:%M:%S)" >> "$OUT.log"
