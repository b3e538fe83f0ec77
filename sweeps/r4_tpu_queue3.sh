#!/bin/bash
# Round-4 TPU queue #3: heteroscedastic recipe matrix (VERDICT #2) +
# calibration lever on real data (VERDICT #4). All protocol runs now
# train their 8 splits as ONE vmapped fit (round-4 accelerator).
cd /root/repo
run() { name=$1; ds=$2; shift 2; echo "=== $name $(date +%T)"; timeout 5400 python experiments/run_uci.py $ds --quiet --ckpt-dir /tmp/r4q3/$name "$@" 2>/dev/null | tail -1; }

# yacht rows of the hetero matrix (homosced tuned = round-2 published)
run H_yacht8_split  yacht --splits 8 --bias --train-samples 8 --per-example-noise --sigma0 0.1 --normalize-y --kl-warmup-frac 0.4 --heteroscedastic
run H_yacht8_freeze yacht --splits 8 --bias --train-samples 8 --per-example-noise --sigma0 0.1 --normalize-y --kl-warmup-frac 0.4 --heteroscedastic --noise-freeze-frac 0.5

# concrete freeze tuning where pred-MNLL regressed (freeze frac / noise prior)
run C_tune_frz75    concrete --splits 8 --bias --train-samples 8 --per-example-noise --sigma0 0.1 --normalize-y --kl-warmup-frac 0.4 --heteroscedastic --noise-freeze-frac 0.75
run C_tune_lnoise01 concrete --splits 8 --bias --train-samples 8 --per-example-noise --sigma0 0.1 --normalize-y --kl-warmup-frac 0.4 --heteroscedastic --noise-freeze-frac 0.5 --lambda-noise 0.1

# calibration lever on the tuned homoscedastic headliners
run CAL_yacht  yacht  --splits 8 --bias --train-samples 8 --per-example-noise --sigma0 0.1 --calibrate
run CAL_energy energy --splits 8 --bias --train-samples 4 --per-example-noise --sigma0 0.1 --normalize-y --kl-warmup-frac 0.4 --calibrate
run CAL_energy_hfrz energy --splits 8 --bias --train-samples 4 --per-example-noise --sigma0 0.1 --normalize-y --kl-warmup-frac 0.4 --heteroscedastic --noise-freeze-frac 0.5 --calibrate
echo "=== done $(date +%T)"
