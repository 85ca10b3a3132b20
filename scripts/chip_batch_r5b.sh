#!/bin/bash
# Round-5 chip batch B (gated on followup_r5): staged-precision d=32 RIPM
# on chip (VERDICT item 3 "Done" criterion) + BoundedPCA certified sweep
# through the p-major kernel.
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=result/chip_batch_r5b.jsonl
: > "$OUT"

for i in $(seq 1 960); do
  grep -q "^DONE" result/followup_r5.jsonl 2>/dev/null && break
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

run_job sid32_ripm_staged_precon 5400 python scripts/sid32_ripm_longrun.py \
  --batch 8 --segments 12 --staged-at 6 \
  --option KrylovPreconditioner=jacobi_theta

run_job boundedpca_certified_b16 2400 \
  python -m riptrm_tpu.experiment.chip_sweep --problem BoundedPCA \
  --size 128 --batch 16 --pallas --certify

echo DONE >> "$OUT.log"
echo DONE >> "$OUT"
