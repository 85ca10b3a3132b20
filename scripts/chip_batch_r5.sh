#!/bin/bash
# Round-5 chip batch: waits for the d=32 CPU deep run (single queue — CPU
# contention pollutes gen/timing), then runs:
#  1. roofline final (sphere + p-major/lane-major stiefel A/B), 2 reps
#  2. BoundedPCA sweeps through the p-major kernel (B=16/64/128)
#  3. staged-precision one-jit vs compacted (VERDICT item 4), n=1000
#  4. Rosenbrock/Grassmann first chip evidence (VERDICT item 6)
#  5. d=32 RIPM plain-vs-jacobi_theta segmented A/B (VERDICT item 3)
#  6. NonnegPCA cache-hit validation sweep + bench.py end-to-end
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=result/chip_batch_r5.jsonl
: > "$OUT"

# serialize behind the CPU deep run
for i in $(seq 1 960); do
  grep -q "^# all done" result/sid32_cpu_deep.jsonl 2>/dev/null && break
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

# 1. roofline (writes result/roofline.json); second rep to a scratch file
#    for variance bounds on the bare-chain denominator
run_job roofline_rep1 3600 python -m riptrm_tpu.experiment.roofline \
  --batches 16 64 128 --out result/roofline.json
run_job roofline_rep2 3600 python -m riptrm_tpu.experiment.roofline \
  --skip-sphere --batches 16 64 128 --out result/roofline_rep2.json

# 2. BoundedPCA end-to-end through the p-major kernel
run_job boundedpca_pallas_b16 2400 $CS --problem BoundedPCA --size 128 \
  --batch 16 --pallas
run_job boundedpca_pallas_b64 2400 $CS --problem BoundedPCA --size 128 \
  --batch 64 --pallas
run_job boundedpca_pallas_b128 2400 $CS --problem BoundedPCA --size 128 \
  --batch 128 --pallas

# 3. staged precision: one-jit baseline vs compacted (item 4 target:
#    >=3x the r4 23.9 solves/s at B=16, same 5e-6-class floor)
run_job staged_onejit_b16 2400 $CS --problem NonnegPCA --size 1000 \
  --batch 16 --staged-precision --staged-tolresid 3e-6
run_job staged_compact_b16 2400 $CS --problem NonnegPCA --size 1000 \
  --batch 16 --staged-precision --staged-compact --staged-tolresid 3e-6
run_job staged_compact_b128 3600 $CS --problem NonnegPCA --size 1000 \
  --batch 128 --staged-precision --staged-compact --staged-tolresid 3e-6

# 4. Rosenbrock/Grassmann chip evidence (reference scale + scaled-up)
run_job rosenbrock_n8_b16 2400 $CS --problem Rosenbrock --size 8 \
  --batch 16 --max-steps 600 --maxiter 100
run_job rosenbrock_n8_b64 2400 $CS --problem Rosenbrock --size 8 \
  --batch 64 --max-steps 600 --maxiter 100
run_job rosenbrock_n256_k8_b16 3600 $CS --problem Rosenbrock --size 256 \
  --batch 16 --max-steps 600 --maxiter 100

# 5. d=32 RIPM segmented A/B: plain vs jacobi_theta preconditioner
run_job sid32_ripm_plain 3600 python scripts/sid32_ripm_longrun.py \
  --batch 8 --segments 8
run_job sid32_ripm_precon 3600 python scripts/sid32_ripm_longrun.py \
  --batch 8 --segments 8 --option KrylovPreconditioner=jacobi_theta

# 6. cache validation + headline bench
run_job nonnegpca_cached_b16 1800 $CS --problem NonnegPCA --size 1000 \
  --batch 16
run_job nonnegpca_cached_again 1800 $CS --problem NonnegPCA --size 1000 \
  --batch 16
run_job bench 3600 python bench.py

echo DONE >> "$OUT.log"
echo DONE >> "$OUT"
