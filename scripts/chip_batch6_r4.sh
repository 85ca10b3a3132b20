#!/bin/bash
# Round-4 chip batch 6 (post-CPU-batch): RIPM d=32 retry with call
# lengths under the 2-minute worker limit, and a bench.py validation
# run (warms the compile cache for the driver's official pass).
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=result/chip_batch6_r4.jsonl
: > "$OUT"

for i in $(seq 1 960); do
  grep -q "^DONE" result/cpu_batch_r4.log 2>/dev/null && break
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
run_job sid32_ripm_krylov_short 2400 $CS --problem StableIdentification \
  --size 32 --batch 8 --solver RIPM --max-steps 100 --maxiter 100 \
  --option KrylovIterMethod=true --option KrylovMaxIteration=150

echo "=== bench_validate ($(date +%H:%M:%S))" >> "$OUT.log"
timeout 900 python bench.py 2>>"$OUT.log" | tail -1 >> "$OUT"

echo "DONE $(date +%H:%M:%S)" >> "$OUT.log"
