#!/bin/bash
# Round-2 TPU queue #3: headline 8-split UCI runs with the bias recipe,
# new-dataset coverage, real classifier data on TPU, full BASELINE
# configs, and the 3-way kernel bench (fp32 XLA / bf16 XLA / pallas).
cd /root/repo
run() { name=$1; ds=$2; shift 2; echo "=== $name $(date +%T)"; timeout 5400 python experiments/run_uci.py $ds --quiet --ckpt-dir /tmp/yq3/$name "$@" 2>/dev/null | tail -1; }
run F_yacht8    yacht    --splits 8 --bias --train-samples 8 --per-example-noise --sigma0 0.1
run F_concrete8 concrete --splits 8 --bias --train-samples 4 --per-example-noise --sigma0 0.3
run F_energy8   energy   --splits 8 --bias --train-samples 4 --per-example-noise --sigma0 0.3
run F_diabetes4 diabetes --splits 4 --bias --train-samples 4 --per-example-noise --sigma0 0.3 --normalize-y
echo "=== digits_tpu_w1024 $(date +%T)"
timeout 3600 python experiments/run_mnist.py --data digits --width 1024 \
  --epochs1 5 --epochs2 495 --train-samples 2 --hmc 2>/dev/null | tail -1
echo "=== baseline_configs_full $(date +%T)"
timeout 3600 python experiments/run_baseline_configs.py 2>/dev/null | tail -2
echo "=== kernel_check_3way $(date +%T)"
timeout 2400 python benchmarks/tpu_kernel_check.py --iters 100 \
  --sizes 1024 2048 4096 8192 16384 2>/dev/null
echo "=== done $(date +%T)"
