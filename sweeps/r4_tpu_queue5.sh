#!/bin/bash
# Round-4 follow-ups: the TRUE no-freeze yacht hetero row (the queue3
# "split" run silently used the noise_freeze_frac=0.5 default — both
# yacht rows were +freeze and bit-identical), + a no-freeze energy
# cross-check of the r3 result on current code.
cd /root/repo
run() { name=$1; ds=$2; shift 2; echo "=== $name $(date +%T)"; timeout 5400 python experiments/run_uci.py $ds --quiet --ckpt-dir /tmp/r4q5/$name "$@" 2>/dev/null | tail -1; }
run H_yacht8_nofreeze yacht --splits 8 --bias --train-samples 8 --per-example-noise --sigma0 0.1 --normalize-y --kl-warmup-frac 0.4 --heteroscedastic --noise-freeze-frac 0
# quantile-mode calibration re-runs (queue3's CAL rows used the ML tau,
# which overshot coverage on yacht — see RESULTS round 4)
run CALQ_yacht  yacht  --splits 8 --bias --train-samples 8 --per-example-noise --sigma0 0.1 --calibrate --calib-frac 0.15
run CALQ_energy energy --splits 8 --bias --train-samples 4 --per-example-noise --sigma0 0.1 --normalize-y --kl-warmup-frac 0.4 --calibrate --calib-frac 0.15
run CALQ_energy_hfrz energy --splits 8 --bias --train-samples 4 --per-example-noise --sigma0 0.1 --normalize-y --kl-warmup-frac 0.4 --heteroscedastic --noise-freeze-frac 0.5 --calibrate --calib-frac 0.15
echo "=== done $(date +%T)"
