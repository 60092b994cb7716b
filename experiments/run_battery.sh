#!/bin/sh
# One-shot TPU measurement battery: run the moment the tunnel is back.
# Sequential (single-core host); each step bounded; logs under /tmp.
set -x
cd "$(dirname "$0")/.."
timeout 580 python bench.py > /tmp/r2_bench_default.log 2>&1
timeout 580 python bench.py --serving > /tmp/r2_bench_serving.log 2>&1
timeout 580 python experiments/e5_glue.py > /tmp/r2_e5.log 2>&1
timeout 580 python experiments/e4_paired_layout.py > /tmp/r2_e4.log 2>&1
timeout 580 python experiments/e2_bisect.py > /tmp/r2_e2.log 2>&1
tail -n 3 /tmp/r2_bench_default.log /tmp/r2_bench_serving.log \
    /tmp/r2_e5.log /tmp/r2_e4.log /tmp/r2_e2.log
