#!/bin/bash
# Round-5 chip batch C (gated on r5b): Rosenbrock with adequate budgets —
# the first runs (chip_batch_r5) were budget-starved at the alpha=1e7
# conditioning (median residual 6.5e3 after 400 steps).  Find the f32
# floor with a 10k-step schedule, and a one-jit staged B=128 comparator
# for the compaction A/B.
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=result/chip_batch_r5c.jsonl
: > "$OUT"

for i in $(seq 1 960); do
  grep -q "^DONE" result/chip_batch_r5b.jsonl 2>/dev/null && break
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

run_job rosenbrock_n8_b16_long 3600 $CS --problem Rosenbrock --size 8 \
  --batch 16 --max-steps 10000 --maxiter 2000 --tolresid 1e-2
run_job rosenbrock_n256_k8_b16_long 3600 $CS --problem Rosenbrock \
  --size 256 --batch 16 --max-steps 3000 --maxiter 600 --tolresid 1e-2
run_job staged_onejit_b128 3600 $CS --problem NonnegPCA --size 1000 \
  --batch 128 --staged-precision --staged-tolresid 3e-6

echo DONE >> "$OUT.log"
echo DONE >> "$OUT"
