#!/bin/bash
# Round-3 TPU queue #4 (optional, time-permitting): re-run the headline
# homoscedastic UCI configs so the tables gain the new coverage95
# calibration column (and reconfirm the round-2 numbers reproduce on
# the current code).
cd /root/repo
run() { name=$1; ds=$2; shift 2; echo "=== $name $(date +%T)"; timeout 5400 python experiments/run_uci.py $ds --quiet --ckpt-dir /tmp/r3q4/$name "$@" 2>/dev/null | tail -1; }
run C_yacht8    yacht  --splits 8 --bias --train-samples 8 --per-example-noise --sigma0 0.1
run C_energy8   energy --splits 8 --bias --train-samples 4 --per-example-noise --sigma0 0.1 --normalize-y --kl-warmup-frac 0.4
echo "=== done $(date +%T)"
