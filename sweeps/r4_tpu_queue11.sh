#!/bin/bash
# Round-4 queue #11: dense-vs-diagonal metric on the mixed-lambda
# posterior, ON the v5e (epochs=8000 study config).
cd /root/repo
echo "=== mixed NUTS TPU dense-mass $(date +%T)"
timeout 5400 python experiments/run_vi_vs_hmc.py --tier mixed --epochs 8000 --dense-mass --out sweeps/r4_mixed_lambda_tpu_dense.json 2>&1 | tail -2
echo "=== done $(date +%T)"
