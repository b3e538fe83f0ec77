#!/bin/bash
# CPU capacity probes for yacht (1 split, stack mode): what does the mean
# function reach without the KL, and what do biases buy?
cd /root/repo
BASE="--cpu --splits 1 --quiet"
run() { name=$1; shift; echo "=== $name $(date +%T)"; timeout 2000 python experiments/run_uci.py yacht $BASE --ckpt-dir /tmp/ycpu/$name "$@" 2>/dev/null | tail -1; }
run C1_nokl            --ignore-kl
run C2_nokl_bias       --ignore-kl --bias
run C3_bias_tuned      --bias --train-samples 4 --per-example-noise --sigma0 0.3
run C4_bias_normy      --bias --train-samples 4 --per-example-noise --sigma0 0.1 --normalize-y
echo "=== done $(date +%T)"
