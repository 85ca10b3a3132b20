#!/bin/bash
# Round-5 sharded-HVP decomposition: d=32 at 2/4/8 virtual devices + d=8 sanity.
# One JSON line per config -> result/sidratio_r5.jsonl
set -u
cd /root/repo
OUT=result/sidratio_r5.jsonl
: > $OUT
for vd in 2 4 8; do
  timeout 2400 python -m riptrm_tpu.experiment.sid_sharded_ratio \
    --d 32 --virtual-devices $vd 2>>$OUT.log | tail -1 >> $OUT
done
timeout 1200 python -m riptrm_tpu.experiment.sid_sharded_ratio \
  --d 8 --virtual-devices 8 2>>$OUT.log | tail -1 >> $OUT
echo DONE >> $OUT
