#!/bin/bash
cd /root/repo
run() { name=$1; ds=$2; shift 2; echo "=== $name $(date +%T)"; timeout 5400 python experiments/run_uci.py $ds --quiet --ckpt-dir /tmp/r4q15/$name "$@" 2>/dev/null | tail -1; }
run CALQ_energy_hfrz_f10 energy --splits 8 --bias --train-samples 4 --per-example-noise --sigma0 0.1 --normalize-y --kl-warmup-frac 0.4 --heteroscedastic --noise-freeze-frac 0.5 --calibrate --calib-frac 0.1
run CALQ_concrete concrete --splits 8 --bias --train-samples 8 --per-example-noise --sigma0 0.1 --normalize-y --kl-warmup-frac 0.4 --calibrate --calib-frac 0.15
echo "=== done $(date +%T)"
