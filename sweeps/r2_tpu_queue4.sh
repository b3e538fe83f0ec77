#!/bin/bash
# Round-2 TPU queue #4: remaining quality pushes + headline bench sanity.
cd /root/repo
run() { name=$1; ds=$2; shift 2; echo "=== $name $(date +%T)"; timeout 5400 python experiments/run_uci.py $ds --quiet --ckpt-dir /tmp/yq4/$name "$@" 2>/dev/null | tail -1; }
run F_yacht8_normy  yacht  --splits 8 --bias --train-samples 8 --per-example-noise --sigma0 0.1 --normalize-y --kl-warmup-frac 0.4
run F_energy8_normy energy --splits 8 --bias --train-samples 4 --per-example-noise --sigma0 0.1 --normalize-y --kl-warmup-frac 0.4
echo "=== bench $(date +%T)"
timeout 1200 python bench.py 2>/dev/null | tail -1
echo "=== done $(date +%T)"
