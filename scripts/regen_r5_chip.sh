#!/bin/bash
# Regenerate the round-5 chip artifacts lost in the host reset between
# builder sessions (BENCH.md cites them; the measurements were made but
# the files were never committed).  Priority-ordered so the most-cited
# rows land first; touch result/STOP_CHIP to truncate the queue after
# the current job.
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
R5=result/chip_batch_r5.jsonl
R5C=result/chip_batch_r5c.jsonl
: > "$R5"
: > "$R5C"
rm -f result/STOP_CHIP

run_job() {
  local out="$1"; shift
  local tag="$1"; shift
  local to="$1"; shift
  if [ -e result/STOP_CHIP ]; then
    echo "{\"tag\": \"$tag\", \"result\": \"skipped (STOP_CHIP)\"}" >> "$out"
    return
  fi
  echo "=== $tag : $* ($(date +%H:%M:%S))" >> "$out.log"
  local line
  line=$(timeout "$to" "$@" 2>>"$out.log" | grep -v cpu_aot | tail -1)
  if [ -n "$line" ]; then
    echo "{\"tag\": \"$tag\", \"result\": $line}" >> "$out"
  else
    echo "{\"tag\": \"$tag\", \"result\": null}" >> "$out"
  fi
}

CS="python -m riptrm_tpu.experiment.chip_sweep"

# 1. cache-validation rows (cheap; also warms the common sweep program)
run_job $R5 nonnegpca_cached_b16 2400 $CS --problem NonnegPCA --size 1000 \
  --batch 16
run_job $R5 nonnegpca_cached_again 1200 $CS --problem NonnegPCA --size 1000 \
  --batch 16

# 2. d=32 RIPM segmented A/B: plain vs jacobi_theta (VERDICT item 3 Done)
run_job $R5 sid32_ripm_plain 3000 python scripts/sid32_ripm_longrun.py \
  --batch 8 --segments 8
run_job $R5 sid32_ripm_precon 3000 python scripts/sid32_ripm_longrun.py \
  --batch 8 --segments 8 --option KrylovPreconditioner=jacobi_theta

# 3. roofline rep1 (p-major vs lane-major stiefel + sphere rows)
run_job $R5 roofline_rep1 3600 python -m riptrm_tpu.experiment.roofline \
  --batches 16 64 128 --out result/roofline.json

# 4. staged precision: one-jit vs compacted (VERDICT item 4 measured negative)
run_job $R5 staged_onejit_b16 2400 $CS --problem NonnegPCA --size 1000 \
  --batch 16 --staged-precision --staged-tolresid 3e-6
run_job $R5 staged_compact_b16 2400 $CS --problem NonnegPCA --size 1000 \
  --batch 16 --staged-precision --staged-compact --staged-tolresid 3e-6
run_job $R5C staged_onejit_b128 2700 $CS --problem NonnegPCA --size 1000 \
  --batch 128 --staged-precision --staged-tolresid 3e-6
run_job $R5 staged_compact_b128 2700 $CS --problem NonnegPCA --size 1000 \
  --batch 128 --staged-precision --staged-compact --staged-tolresid 3e-6

# 5. BoundedPCA end-to-end through the p-major kernel
run_job $R5 boundedpca_pallas_b16 2400 $CS --problem BoundedPCA --size 128 \
  --batch 16 --pallas
run_job $R5 boundedpca_pallas_b64 2400 $CS --problem BoundedPCA --size 128 \
  --batch 64 --pallas
run_job $R5 boundedpca_pallas_b128 2400 $CS --problem BoundedPCA --size 128 \
  --batch 128 --pallas

# 6. Rosenbrock long-schedule chip runs (the r5c open item)
run_job $R5C rosenbrock_n8_b16_long 3600 $CS --problem Rosenbrock --size 8 \
  --batch 16 --max-steps 10000 --maxiter 2000 --tolresid 1e-2
run_job $R5C rosenbrock_n256_k8_b16_long 3600 $CS --problem Rosenbrock \
  --size 256 --batch 16 --max-steps 3000 --maxiter 600 --tolresid 1e-2

# 7. RSQO schulz vs schulz_polish chip throughput A/B
run_job $R5 rsqo_schulz_b64 2400 $CS --problem NonnegPCA --size 200 \
  --batch 64 --solver RSQO --rsqo-linear-solver schulz
run_job $R5 rsqo_schulz_polish_b64 2400 $CS --problem NonnegPCA --size 200 \
  --batch 64 --solver RSQO --rsqo-linear-solver schulz_polish

# 8. roofline rep2 (denominator variance bound) + headline bench
run_job $R5 roofline_rep2 2400 python -m riptrm_tpu.experiment.roofline \
  --skip-sphere --batches 16 64 128 --out result/roofline_rep2.json
run_job $R5 bench 3000 python bench.py

echo DONE >> "$R5.log"
echo DONE >> "$R5"
echo DONE >> "$R5C"
