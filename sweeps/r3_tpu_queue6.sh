#!/bin/bash
# Round-3 TPU queue #6 (opportunistic): concrete heteroscedastic with
# the noise-freeze curriculum (queue5's energy run: freeze turned
# hetero from worst to best config; concrete split-head-no-freeze was
# 4.81 vs homosced 4.32).
cd /root/repo
run() { name=$1; ds=$2; shift 2; echo "=== $name $(date +%T)"; timeout 5400 python experiments/run_uci.py $ds --quiet --ckpt-dir /tmp/r3q6/$name "$@" 2>/dev/null | tail -1; }
run H_concrete8_freeze concrete --splits 8 --bias --train-samples 8 --per-example-noise --sigma0 0.1 --normalize-y --kl-warmup-frac 0.4 --heteroscedastic --noise-freeze-frac 0.5
echo "=== done $(date +%T)"
