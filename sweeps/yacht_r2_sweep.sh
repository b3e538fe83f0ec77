#!/bin/bash
# Round-2 yacht quality sweep (CPU, 4 splits each).
# Focus: rect_mode=pad (full-mixing padded square first layer — untested
# capacity lever from round 1), sigma0, samples, epochs interactions.
# Target: paper yacht RMSE 0.69 +- 0.16, MNLL 1.80 +- 1.01.
cd /root/repo
BASE="--cpu --splits 4 --quiet"
run() { name=$1; shift; echo "=== $name"; timeout 4000 python experiments/run_uci.py yacht $BASE --ckpt-dir /tmp/yr2/$name "$@" 2>/dev/null | tail -1; }
run P1_pad_s8       --rect-mode pad --train-samples 8 --per-example-noise --sigma0 0.3
run P2_pad_s8_sig01 --rect-mode pad --train-samples 8 --per-example-noise --sigma0 0.1
run P3_pad_long     --rect-mode pad --train-samples 8 --per-example-noise --sigma0 0.3 --epochs2 100000
run P4_stack_sig01  --train-samples 8 --per-example-noise --sigma0 0.1
run P5_pad_normy    --rect-mode pad --train-samples 8 --per-example-noise --sigma0 0.3 --normalize-y --kl-warmup-frac 0.4
echo "=== done"
