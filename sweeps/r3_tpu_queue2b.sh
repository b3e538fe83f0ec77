#!/bin/bash
# Round-3 TPU queue #2b: resume of queue2 (interrupted after the first
# heteroscedastic energy run). Changes vs queue2:
# - kin8nm-scale feasibility FIRST (VERDICT missing #3 — bank it)
# - heteroscedastic runs now use the TUNED homoscedastic recipe
#   (sigma0 0.1 / kl-warmup 0.4 on normalized y; sigma0 0.3 raw) —
#   queue2's untuned energy run (sigma0=1 on normalized y, no warmup)
#   gave RMSE 1.106 vs the homoscedastic 0.498; sigma0 now actually
#   reaches the heteroscedastic head (likelihoods.py shift).
cd /root/repo
echo "=== kin8nm_scale_feasibility $(date +%T)"
timeout 5400 python experiments/run_protocol_feasibility.py 2>/dev/null | tail -1
run() { name=$1; ds=$2; shift 2; echo "=== $name $(date +%T)"; timeout 5400 python experiments/run_uci.py $ds --quiet --ckpt-dir /tmp/r3q2/$name "$@" 2>/dev/null | tail -1; }
run H_energy8_tuned   energy   --splits 8 --bias --train-samples 4 --per-example-noise --sigma0 0.1 --normalize-y --kl-warmup-frac 0.4 --heteroscedastic
run H_concrete8_tuned concrete --splits 8 --bias --train-samples 8 --per-example-noise --sigma0 0.1 --normalize-y --kl-warmup-frac 0.4 --heteroscedastic
run H_energy8_raw     energy   --splits 8 --bias --train-samples 4 --per-example-noise --sigma0 0.3 --heteroscedastic
echo "=== done $(date +%T)"
