#!/bin/bash
# Round-4 queue #10: yacht hetero variants (close the RMSE gap while
# keeping the -0.08 nats/pt density) + serving-path regression check.
cd /root/repo
run() { name=$1; ds=$2; shift 2; echo "=== $name $(date +%T)"; timeout 5400 python experiments/run_uci.py $ds --quiet --ckpt-dir /tmp/r4q10/$name "$@" 2>/dev/null | tail -1; }
run H_yacht_ln03  yacht --splits 8 --bias --train-samples 8 --per-example-noise --sigma0 0.1 --normalize-y --kl-warmup-frac 0.4 --heteroscedastic --noise-freeze-frac 0 --lambda-noise 0.3
run H_yacht_s03   yacht --splits 8 --bias --train-samples 8 --per-example-noise --sigma0 0.3 --normalize-y --kl-warmup-frac 0.4 --heteroscedastic --noise-freeze-frac 0
echo "=== serving D=4096 regression $(date +%T)"
timeout 2400 python experiments/run_scaling.py --sizes 4096 --predict --steps 20 2>&1 | tail -2
echo "=== done $(date +%T)"
