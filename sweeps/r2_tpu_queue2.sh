#!/bin/bash
# Round-2 TPU queue #2: bias-focused yacht quality (the no-KL probes showed
# bias lifts the capacity ceiling 1.16 -> 0.60 RMSE), reference-exact rows
# for report hygiene, then the honest kernel re-measurement.
cd /root/repo
run() { name=$1; ds=$2; shift 2; echo "=== $name $(date +%T)"; timeout 2400 python experiments/run_uci.py $ds --quiet --ckpt-dir /tmp/yq2/$name "$@" 2>/dev/null | tail -1; }
# --- yacht bias screening (2 splits)
run B1_bias_s8       yacht --splits 2 --bias --train-samples 8 --per-example-noise --sigma0 0.3
run B2_bias_s8_sig01 yacht --splits 2 --bias --train-samples 8 --per-example-noise --sigma0 0.1
run B3_bias_normy    yacht --splits 2 --bias --train-samples 8 --per-example-noise --sigma0 0.1 --normalize-y --kl-warmup-frac 0.4
run B4_bias_long     yacht --splits 2 --bias --train-samples 8 --per-example-noise --sigma0 0.3 --epochs2 100000
# --- reference-exact rows (report hygiene; 4 splits)
run RE_yacht    yacht    --splits 4 --reference-exact
run RE_energy   energy   --splits 4 --reference-exact
run RE_concrete concrete --splits 4 --reference-exact
echo "=== kernel_check_randomsign $(date +%T)"
timeout 2400 python benchmarks/tpu_kernel_check.py --iters 100 \
  --sizes 1024 2048 4096 8192 16384 2>/dev/null
echo "=== done $(date +%T)"
