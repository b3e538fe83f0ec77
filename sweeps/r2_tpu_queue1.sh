#!/bin/bash
# Round-2 TPU queue #1 (strictly sequential - one TPU job at a time):
#  1. honest kernel head-to-head (scalar-fetch timing) across D
#  2. yacht quality screening, 2 splits each (pad mode is too slow on CPU)
cd /root/repo
echo "=== kernel_check $(date +%T)"
timeout 2400 python benchmarks/tpu_kernel_check.py --iters 100 \
  --sizes 256 1024 2048 4096 8192 16384 2>/dev/null
BASE="--splits 2 --quiet"
run() { name=$1; shift; echo "=== $name $(date +%T)"; timeout 2400 python experiments/run_uci.py yacht $BASE --ckpt-dir /tmp/yr2/$name "$@" 2>/dev/null | tail -1; }
run P1_pad_s8       --rect-mode pad --train-samples 8 --per-example-noise --sigma0 0.3
run P2_pad_s8_sig01 --rect-mode pad --train-samples 8 --per-example-noise --sigma0 0.1
run P3_pad_long     --rect-mode pad --train-samples 8 --per-example-noise --sigma0 0.3 --epochs2 100000
run P4_stack_sig01  --train-samples 8 --per-example-noise --sigma0 0.1
run P5_pad_normy    --rect-mode pad --train-samples 8 --per-example-noise --sigma0 0.3 --normalize-y --kl-warmup-frac 0.4
run P6_pad_s4       --rect-mode pad --train-samples 4 --per-example-noise --sigma0 0.3
echo "=== done $(date +%T)"
