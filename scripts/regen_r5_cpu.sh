#!/bin/bash
# Regenerate the round-5 CPU/x64 artifacts lost in the host reset
# (sidratio_r5.jsonl, protocol_rsqo_schulz_polish.json,
# sid32_cpu_deep.jsonl).  Run ONLY while the chip queue idles (2-vCPU
# host: CPU contention pollutes chip timing measurements).  Fast,
# high-priority jobs first; the open-ended d=32 deep arms last (their
# per-segment JSONL means partial runs still land evidence).  Touch
# result/STOP_CPU to truncate after the current job.
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
rm -f result/STOP_CPU

guard() {
  [ -e result/STOP_CPU ] && exit 0
}

# 1. sharded-HVP decomposition (VERDICT item 1): d=32 at 2/4/8 virtual
#    devices + d=8 sanity; one JSON line per config.
OUT=result/sidratio_r5.jsonl
: > $OUT
for vd in 2 4 8; do
  guard
  timeout 2400 python -m riptrm_tpu.experiment.sid_sharded_ratio \
    --d 32 --virtual-devices $vd 2>>$OUT.log | grep -v cpu_aot | tail -1 >> $OUT
done
guard
timeout 1200 python -m riptrm_tpu.experiment.sid_sharded_ratio \
  --d 8 --virtual-devices 8 2>>$OUT.log | grep -v cpu_aot | tail -1 >> $OUT
echo DONE >> $OUT

# 2. d=32 CPU/x64 deep plain-RIPM arm (VERDICT item 2 headline: 4/8
#    lanes to 3.6e-3-5.7e-3 over 2,000 Newton steps).  Per-segment
#    JSONL -> a truncated run still lands partial evidence.
OUT=result/sid32_cpu_deep.jsonl
: > $OUT
echo "# start $(date -Is)" >> $OUT
guard
timeout 10800 python scripts/sid32_cpu_deep.py --arm ripm \
  --segments 40 --segment-steps 50 --krylov-iters 400 \
  2>>$OUT.log >> $OUT
echo "# ripm done $(date -Is)" >> $OUT

# 3. schulz_polish deep-parity protocol (VERDICT item 8)
guard
timeout 5400 python -m riptrm_tpu.experiment.protocol_speedrun \
  --problems StableIdentification --solvers RSQO \
  --option quadoptim_linear_solver=schulz_polish \
  --option quadoptim_warm_start=false \
  --out result/protocol_rsqo_schulz_polish.json \
  > result/protocol_rsqo_schulz_polish.log 2>&1

# 4. remaining deep arms, trimmed to the budgets the BENCH.md narrative
#    actually used (ripm_p truncated at 600 steps, riptrm at 2,400
#    inner steps).
guard
timeout 5400 python scripts/sid32_cpu_deep.py --arm ripm_p \
  --segments 12 --segment-steps 50 --krylov-iters 400 \
  2>>$OUT.log >> $OUT
echo "# ripm_p done $(date -Is)" >> $OUT
guard
timeout 5400 python scripts/sid32_cpu_deep.py --arm riptrm \
  --segments 4 --segment-steps 600 \
  2>>$OUT.log >> $OUT
echo "# all done $(date -Is)" >> $OUT
