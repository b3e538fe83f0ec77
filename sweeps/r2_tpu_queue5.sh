#!/bin/bash
cd /root/repo
run() { name=$1; ds=$2; shift 2; echo "=== $name $(date +%T)"; timeout 5400 python experiments/run_uci.py $ds --quiet --ckpt-dir /tmp/yq5/$name "$@" 2>/dev/null | tail -1; }
run F_concrete8_s8 concrete --splits 8 --bias --train-samples 8 --per-example-noise --sigma0 0.1
run F_diabetes4raw diabetes --splits 4 --bias --train-samples 4 --per-example-noise --sigma0 0.3
echo "=== done $(date +%T)"
