#!/bin/bash
# Round-5 TPU chain, stages 2-3 only (stage 1 warm bench already done,
# /tmp/r5_bench_warm.log rc=0). Sequential — ONE TPU process at a time.
set -x
cd /root/repo

BENCH_DTYPE=f32 BENCH_EOT_PAIRED_MODE=two_pass BENCH_FULL_EOT_ITERS2=12 \
  BENCH_DEEP=1 BENCH_BUDGET_S=10800 BENCH_HARD_KILL_S=10900 \
  timeout 10900 python bench.py > /tmp/r5_bench_f32.log 2>&1
echo "stage2 rc=$?"

timeout 7200 python scripts/tpu_round5a_f32_longL.py \
  > /tmp/r5_longL.log 2>&1
echo "stage3 rc=$?"
echo "CHAIN DONE"
