#!/bin/bash
# Round-4 follow-ups: the TRUE no-freeze yacht hetero row (the queue3
# "split" run silently used the noise_freeze_frac=0.5 default — both
# yacht rows were +freeze and bit-identical), + a no-freeze energy
# cross-check of the r3 result on current code.
cd /root/repo
run() { name=$1; ds=$2; shift 2; echo "=== $name $(date +%T)"; timeout 5400 python experiments/run_uci.py $ds --quiet --ckpt-dir /tmp/r4q5/$name "$@" 2>/dev/null | tail -1; }
run H_yacht8_nofreeze yacht --splits 8 --bias --train-samples 8 --per-example-noise --sigma0 0.1 --normalize-y --kl-warmup-frac 0.4 --heteroscedastic --noise-freeze-frac 0
# quantile-mode calibration re-runs (queue3's CAL rows used the ML tau,
# which overshot coverage on yacht — see RESULTS round 4)
run CALQ_yacht  yacht  --splits 8 --bias --train-samples 8 --per-example-noise --sigma0 0.1 --calibrate --calib-frac 0.15
run CALQ_energy energy --splits 8 --bias --train-samples 4 --per-example-noise --sigma0 0.1 --normalize-y --kl-warmup-frac 0.4 --calibrate --calib-frac 0.15
run CALQ_energy_hfrz energy --splits 8 --bias --train-samples 4 --per-example-noise --sigma0 0.1 --normalize-y --kl-warmup-frac 0.4 --heteroscedastic --noise-freeze-frac 0.5 --calibrate --calib-frac 0.15
# TPU NUTS precision hypothesis: bf16 MXU operands vs lambda=1e-5
# coordinates (the default-precision TPU rerun failed the convergence
# gates the CPU study passed: adapted ESS 2 vs 1531)
echo "=== mixed-lambda NUTS TPU precision=highest $(date +%T)"
timeout 5400 python experiments/run_vi_vs_hmc.py --tier mixed --precision highest --out sweeps/r4_mixed_lambda_tpu_highest.json 2>&1 | tail -2
echo "=== auto-dispatch re-measure $(date +%T)"
timeout 3600 python benchmarks/auto_dispatch_check.py 2>&1 | grep -v WARNING
timeout 3600 python benchmarks/tpu_kernel_check.py --sizes 2048 4096 8192 2>&1 | grep -v WARNING
echo "=== digits width 4096, longer budget $(date +%T)"
timeout 5400 python experiments/run_mnist.py --data digits --width 4096 --epochs1 5 --epochs2 995 --train-samples 2 2>&1 | tail -2
echo "=== done $(date +%T)"
