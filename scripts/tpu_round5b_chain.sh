#!/bin/bash
# Round-5b TPU chain: f32 chain9 re-run with the vmap-collapse fix
# (paired/full-EOT probes previously crashed on the batched ANY-space
# pallas_call), then a default-env bench to re-warm the driver cache.
set -x
cd /root/repo
BENCH_DTYPE=f32 BENCH_EOT_PAIRED_MODE=two_pass BENCH_FULL_EOT_ITERS2=12 \
  BENCH_DEEP=1 BENCH_BUDGET_S=10800 BENCH_HARD_KILL_S=10900 \
  timeout 10900 python bench.py > /tmp/r5b_bench_f32.log 2>&1
echo "stage-f32 rc=$?"
timeout 3600 python bench.py > /tmp/r5b_bench_default.log 2>&1
echo "stage-default rc=$?"
echo "CHAIN DONE"
