#!/bin/bash
# Round-3 TPU queue #2d: split-prior heteroscedastic heads (Parallel
# layer: mean branch lambda=1e-5, noise branch lambda=1.0) + the
# homoscedastic coverage95 refresh. Supersedes queue2c after its
# energy run showed a SHARED lambda=1.0 head un-regularizes the mean on
# real data (RMSE 1.21 vs homosced 0.498) just as a shared 1e-5 head
# pins the noise (RMSE 1.16) — the split head is the fix.
cd /root/repo
run() { name=$1; ds=$2; shift 2; echo "=== $name $(date +%T)"; timeout 5400 python experiments/run_uci.py $ds --quiet --ckpt-dir /tmp/r3q2d/$name "$@" 2>/dev/null | tail -1; }
run H_energy8_split   energy   --splits 8 --bias --train-samples 4 --per-example-noise --sigma0 0.1 --normalize-y --kl-warmup-frac 0.4 --heteroscedastic
run H_concrete8_split concrete --splits 8 --bias --train-samples 8 --per-example-noise --sigma0 0.1 --normalize-y --kl-warmup-frac 0.4 --heteroscedastic
run C_yacht8    yacht  --splits 8 --bias --train-samples 8 --per-example-noise --sigma0 0.1
run C_energy8   energy --splits 8 --bias --train-samples 4 --per-example-noise --sigma0 0.1 --normalize-y --kl-warmup-frac 0.4
echo "=== done $(date +%T)"
