#!/bin/bash
# Round-3 TPU queue #2c: heteroscedastic real-data runs with the
# lambda_last fix (queue2b's H_energy8_tuned ran before the fix, with
# the protocol's mean-head prior 1e-5 shrinking the noise column — it
# stays in the tables as the real-data A/B control).
cd /root/repo
run() { name=$1; ds=$2; shift 2; echo "=== $name $(date +%T)"; timeout 5400 python experiments/run_uci.py $ds --quiet --ckpt-dir /tmp/r3q2c/$name "$@" 2>/dev/null | tail -1; }
run H_energy8_ll1   energy   --splits 8 --bias --train-samples 4 --per-example-noise --sigma0 0.1 --normalize-y --kl-warmup-frac 0.4 --heteroscedastic
run H_concrete8_ll1 concrete --splits 8 --bias --train-samples 8 --per-example-noise --sigma0 0.1 --normalize-y --kl-warmup-frac 0.4 --heteroscedastic
echo "=== homosced coverage refresh (queue4 folded in)"
run C_yacht8    yacht  --splits 8 --bias --train-samples 8 --per-example-noise --sigma0 0.1
run C_energy8   energy --splits 8 --bias --train-samples 4 --per-example-noise --sigma0 0.1 --normalize-y --kl-warmup-frac 0.4
echo "=== done $(date +%T)"
