#!/bin/bash
# Round-4 RSQO QP linear-solver A/B on the chip (VERDICT r3 item 2).
# Serialized single chip queue; per-job timeouts; JSON lines appended to
# result/rsqo_qp_ab_r4.jsonl with a job tag prefix.
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=result/rsqo_qp_ab_r4.jsonl
: > "$OUT"

run_job() {
  local tag="$1"; shift
  echo "=== $tag : $* ($(date +%H:%M:%S))" >> "$OUT.log"
  local line
  line=$(timeout 1800 "$@" 2>>"$OUT.log" | tail -1)
  if [ -n "$line" ]; then
    echo "{\"tag\": \"$tag\", \"result\": $line}" >> "$OUT"
  else
    echo "{\"tag\": \"$tag\", \"result\": null}" >> "$OUT"
  fi
}

CS="python -m riptrm_tpu.experiment.chip_sweep"
PR="python -m riptrm_tpu.experiment.probe_rsqo_qp"

# headline question first: does schulz scale with B on NonnegPCA?
for B in 16 64 128; do
  run_job "npca_schulz_b$B" $CS --problem NonnegPCA --size 200 --batch $B \
    --solver RSQO --rsqo-linear-solver schulz
done
# chol anchors (round-3 re-baseline under the round-4 code)
for B in 16 64 128; do
  run_job "npca_chol_b$B" $CS --problem NonnegPCA --size 200 --batch $B \
    --solver RSQO --rsqo-linear-solver chol
done
# StableId d=5 grid
for S in schulz chol; do
  for B in 16 64 128; do
    run_job "sid_${S}_b$B" $CS --problem StableIdentification --size 5 \
      --batch $B --solver RSQO --rsqo-linear-solver $S
  done
done
# deep-parity lu, one batched point each
run_job "npca_lu_b16" $CS --problem NonnegPCA --size 200 --batch 16 \
  --solver RSQO --rsqo-linear-solver lu
run_job "sid_lu_b16" $CS --problem StableIdentification --size 5 --batch 16 \
  --solver RSQO --rsqo-linear-solver lu
# QP iteration/status probes
for S in chol schulz lu; do
  run_job "probe_npca_$S" $PR --problem NonnegPCA --size 200 --batch 16 \
    --steps 12 --linear-solver $S
done
run_job "probe_sid_schulz" $PR --problem StableIdentification --size 5 \
  --batch 16 --steps 12 --linear-solver schulz

echo "DONE $(date +%H:%M:%S)" >> "$OUT.log"
