#!/bin/bash
# Round-3 TPU queue #5: the noise-freeze curriculum on the energy
# heteroscedastic config (the one case where every head variant
# underfit the mean: homosced 0.498 vs hetero 1.11-1.22). Freeze holds
# the noise branch at its sigma0 init for the first half of training.
cd /root/repo
run() { name=$1; ds=$2; shift 2; echo "=== $name $(date +%T)"; timeout 5400 python experiments/run_uci.py $ds --quiet --ckpt-dir /tmp/r3q5/$name "$@" 2>/dev/null | tail -1; }
run H_energy8_freeze energy --splits 8 --bias --train-samples 4 --per-example-noise --sigma0 0.1 --normalize-y --kl-warmup-frac 0.4 --heteroscedastic --noise-freeze-frac 0.5
echo "=== done $(date +%T)"
