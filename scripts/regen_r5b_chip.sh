#!/bin/bash
# Round-5 chip batch B regeneration: staged-precision d=32 RIPM on chip
# + BoundedPCA certified sweep through the p-major kernel.  Runs while
# the CPU deep-run arms execute — both sides' cited claims are
# residual-class (deterministic), so host-contention timing skew is
# tolerated here (unlike the timed chip_batch_r5 rows, which ran alone).
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=result/chip_batch_r5b.jsonl
: > "$OUT"

run_job() {
  local tag="$1"; shift
  local to="$1"; shift
  echo "=== $tag : $* ($(date +%H:%M:%S))" >> "$OUT.log"
  local line
  line=$(timeout "$to" "$@" 2>>"$OUT.log" | grep -v cpu_aot | tail -1)
  if [ -n "$line" ]; then
    echo "{\"tag\": \"$tag\", \"result\": $line}" >> "$OUT"
  else
    echo "{\"tag\": \"$tag\", \"result\": null}" >> "$OUT"
  fi
}

run_job sid32_ripm_staged_precon 5400 python scripts/sid32_ripm_longrun.py \
  --batch 8 --segments 12 --staged-at 6 \
  --option KrylovPreconditioner=jacobi_theta

run_job boundedpca_certified_b16 2400 \
  python -m riptrm_tpu.experiment.chip_sweep --problem BoundedPCA \
  --size 128 --batch 16 --pallas --certify

echo DONE >> "$OUT.log"
echo DONE >> "$OUT"
