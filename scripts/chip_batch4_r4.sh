#!/bin/bash
# Round-4 chip batch 4: StableId d=32 retries with adequate budgets
# (first attempt ran the d=5 defaults: 400 steps vs an O(100) initial
# residual) and RIPM's matrix-free Krylov condensed solve.
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=result/chip_batch4_r4.jsonl
: > "$OUT"

for i in $(seq 1 960); do
  grep -q "^DONE" result/chip_batch3_r4.jsonl.log 2>/dev/null && break
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
run_job sid32_riptrm_long 3000 $CS --problem StableIdentification --size 32 \
  --batch 8 --solver RIPTRM --max-steps 2400 --maxiter 200 --stall-window 60
run_job sid32_ripm_krylov 3000 $CS --problem StableIdentification --size 32 \
  --batch 8 --solver RIPM --max-steps 600 --maxiter 600 \
  --option KrylovIterMethod=true --stall-window 60

echo "DONE $(date +%H:%M:%S)" >> "$OUT.log"
