#!/bin/bash
# Round-4 chip batch 2: waits for batch 1 (rsqo_ab_r4) to finish, then
# runs StableId d=32 (VERDICT item 7), staged-precision floor chase
# (item 5), RALM re-measure (item 6), roofline rerun after the gridded
# stiefel kernel (items 3/4), BoundedPCA certified re-measure.
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=result/chip_batch2_r4.jsonl
: > "$OUT"

# serialize behind batch 1 (single chip queue)
for i in $(seq 1 720); do
  grep -q "^DONE" result/rsqo_qp_ab_r4.jsonl.log 2>/dev/null && break
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

run_job staged_n1000_b16 2400 $CS --problem NonnegPCA --size 1000 --batch 16 \
  --staged-precision --staged-tolresid 3e-6
run_job staged_n1000_b128 2400 $CS --problem NonnegPCA --size 1000 --batch 128 \
  --staged-precision --staged-tolresid 3e-6
run_job ralm_npca_b16 2400 $CS --problem NonnegPCA --size 200 --batch 16 \
  --solver RALM
run_job sid32_riptrm_b8 3000 $CS --problem StableIdentification --size 32 \
  --batch 8 --solver RIPTRM
run_job sid32_ripm_b8 3000 $CS --problem StableIdentification --size 32 \
  --batch 8 --solver RIPM
run_job roofline 3600 python -m riptrm_tpu.experiment.roofline
run_job bpca_certified 2400 $CS --problem BoundedPCA --size 128 --batch 16 \
  --pallas --certify

echo "DONE $(date +%H:%M:%S)" >> "$OUT.log"
