#!/bin/bash
# Yacht quality sweep (CPU, 4 splits each) — pick winner for full 8-split run
cd /root/repo
BASE="--cpu --splits 4 --quiet --ckpt-dir /tmp/yacht_sweep_ckpt"
run() { echo "=== $1"; shift; timeout 3000 python experiments/run_uci.py yacht $BASE "$@" 2>/dev/null | tail -1; }
run A_tuned --train-samples 4 --per-example-noise --sigma0 0.3
run B_normy --train-samples 4 --per-example-noise --sigma0 0.3 --normalize-y
run C_warm4 --train-samples 4 --per-example-noise --sigma0 0.3 --kl-warmup-frac 0.4
run D_long  --train-samples 4 --per-example-noise --sigma0 0.3 --epochs2 100000
run E_s8    --train-samples 8 --per-example-noise --sigma0 0.3
run F_het   --train-samples 4 --per-example-noise --sigma0 0.3 --heteroscedastic
