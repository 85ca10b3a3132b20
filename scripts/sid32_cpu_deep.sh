#!/bin/bash
# d=32 CPU/x64 deep-residual run, three arms sequential (VERDICT r4 item 2).
set -u
cd /root/repo
OUT=result/sid32_cpu_deep.jsonl
: > $OUT
echo "# start $(date -Is)" >> $OUT
timeout 14400 python scripts/sid32_cpu_deep.py --arm ripm \
  --segments 40 --segment-steps 50 --krylov-iters 400 \
  2>>$OUT.log >> $OUT
echo "# ripm done $(date -Is)" >> $OUT
timeout 14400 python scripts/sid32_cpu_deep.py --arm ripm_p \
  --segments 40 --segment-steps 50 --krylov-iters 400 \
  2>>$OUT.log >> $OUT
echo "# ripm_p done $(date -Is)" >> $OUT
timeout 14400 python scripts/sid32_cpu_deep.py --arm riptrm \
  --segments 40 --segment-steps 600 \
  2>>$OUT.log >> $OUT
echo "# all done $(date -Is)" >> $OUT
