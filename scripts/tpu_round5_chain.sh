#!/bin/bash
# Round-5 TPU chain (run sequentially — ONE TPU process at a time):
#   1. force-warm every default-env bench.py program (driver cache warm,
#      VERDICT r4 item 1c)
#   1b. true default-env bench.py — must emit its JSON line well inside
#      the driver budget now that the cache is warm (item-1 done check)
#   2. f32 chain9: full f32 key set with the chunk_loop dispatch live
#      (VERDICT item 2; chain8 knobs + BENCH_DEEP for the shared
#      marginal row)
#   3. f32 long-audio fit/perf probes at L=24000/32000 (VERDICT item 3)
set -x
cd /root/repo

BENCH_BUDGET_S=10800 BENCH_HARD_KILL_S=10900 \
  timeout 10900 python bench.py > /tmp/r5_bench_warm.log 2>&1
echo "stage1 rc=$?"

timeout 1200 python bench.py > /tmp/r5_bench_default.log 2>&1
echo "stage1b rc=$?"

BENCH_DTYPE=f32 BENCH_EOT_PAIRED_MODE=two_pass BENCH_FULL_EOT_ITERS2=12 \
  BENCH_DEEP=1 BENCH_BUDGET_S=10800 BENCH_HARD_KILL_S=10900 \
  timeout 10900 python bench.py > /tmp/r5_bench_f32.log 2>&1
echo "stage2 rc=$?"

timeout 7200 python scripts/tpu_round5a_f32_longL.py \
  > /tmp/r5_longL.log 2>&1
echo "stage3 rc=$?"
echo "CHAIN DONE"
