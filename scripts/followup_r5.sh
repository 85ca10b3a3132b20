#!/bin/bash
# Round-5 follow-up chain: waits for chip_batch_r5, then
#  1. chip: RSQO schulz vs schulz_polish throughput A/B
#  2. CPU/x64: StableId deep-parity protocol with schulz_polish
#     (VERDICT item 8 — vs 3/20 schulz, 20/20 lu)
#  3. CPU/x64: full 88-job protocol revalidation (round-5 regression gate:
#     QP refactor, RIPM line-search/CR changes, empty-constraint dtype fix)
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=result/followup_r5.jsonl
: > "$OUT"

for i in $(seq 1 960); do
  grep -q "^DONE" result/chip_batch_r5.jsonl 2>/dev/null && break
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

run_job rsqo_schulz_b64 2400 $CS --problem NonnegPCA --size 200 \
  --batch 64 --solver RSQO --rsqo-linear-solver schulz
run_job rsqo_schulz_polish_b64 2400 $CS --problem NonnegPCA --size 200 \
  --batch 64 --solver RSQO --rsqo-linear-solver schulz_polish

run_job protocol_rsqo_schulz_polish 7200 \
  python -m riptrm_tpu.experiment.protocol_speedrun \
  --problems StableIdentification --solvers RSQO \
  --option quadoptim_linear_solver=schulz_polish \
  --option quadoptim_warm_start=false \
  --out result/protocol_rsqo_schulz_polish.json

run_job protocol_full_r5 10800 \
  python -m riptrm_tpu.experiment.protocol_speedrun \
  --slack 1.05 --out result/protocol_speedrun_r5.json

echo DONE >> "$OUT.log"
echo DONE >> "$OUT"
