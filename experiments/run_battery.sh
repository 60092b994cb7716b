#!/bin/sh
# One-shot TPU measurement battery: run the moment the tunnel is back.
# Sequential (single-core host); each step bounded; logs under /tmp.
# Round-3 edition: official bench (emits serving + default lines), the
# train-step throughput mode, the entry/tail conv A/B (e16), the full
# default-step profile (e12), and the overfit-convergence sweep (e15).
set -x
cd "$(dirname "$0")/.."
timeout 1200 python bench.py > /tmp/r3_bench.log 2>&1
timeout 1800 python bench.py --train > /tmp/r3_bench_train.log 2>&1
timeout 2400 python experiments/e16_entry_tail_ab.py > /tmp/r3_e16.log 2>&1
timeout 1200 python experiments/e12_full_profile.py > /tmp/r3_e12.log 2>&1
timeout 1800 python experiments/e15_overfit_lr.py > /tmp/r3_e15.log 2>&1
tail -n 8 /tmp/r3_bench.log /tmp/r3_bench_train.log /tmp/r3_e16.log \
    /tmp/r3_e12.log /tmp/r3_e15.log
