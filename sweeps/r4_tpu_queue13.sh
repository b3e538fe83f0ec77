#!/bin/bash
# Round-4 queue #13: yacht hetero per-split detail (RMSE sd forensics).
cd /root/repo
echo "=== yacht hetero no-freeze per-split $(date +%T)"
timeout 5400 python experiments/run_uci.py yacht --splits 8 --bias --train-samples 8 --per-example-noise --sigma0 0.1 --normalize-y --kl-warmup-frac 0.4 --heteroscedastic --noise-freeze-frac 0 --ckpt-dir /tmp/r4q13/yh 2>/dev/null | grep '"split"'
echo "=== done $(date +%T)"
