#!/bin/bash
# Round-3 TPU queue #1: precision/numerics measurement (VERDICT missing
# #1), MFU-instrumented scaling re-measurement incl. the single-sourced
# D=16384 row (missing #2, 3 repeats), true-fp32 (HIGHEST) e2e rows,
# serving rows with MFU, kernel 3-way refresh with MFU/roofline columns,
# and the emit_pipeline fused-kernel experiment (weak #5).
cd /root/repo
echo "=== precision_check $(date +%T)"
timeout 3000 python benchmarks/precision_check.py --iters 100 \
  --sizes 1024 4096 16384 2>/dev/null
echo "=== scaling_train_default_x3 $(date +%T)"
timeout 3000 python experiments/run_scaling.py --sizes 4096 16384 \
  --repeats 3 2>/dev/null
echo "=== scaling_train_highest $(date +%T)"
timeout 3000 python experiments/run_scaling.py --sizes 4096 16384 \
  --precision highest --repeats 2 2>/dev/null
echo "=== scaling_predict_default $(date +%T)"
timeout 3000 python experiments/run_scaling.py --predict --sizes 4096 \
  --samples 48 --repeats 3 2>/dev/null
echo "=== kernel_check_3way_mfu $(date +%T)"
timeout 3000 python benchmarks/tpu_kernel_check.py --iters 100 \
  --sizes 2048 4096 8192 16384 2>/dev/null
echo "=== pallas_emit_full $(date +%T)"
timeout 3000 python benchmarks/pallas_diag.py --sizes 16384 --batch 512 \
  --tbs 64 128 256 --iters 50 2>/dev/null
echo "=== done $(date +%T)"
