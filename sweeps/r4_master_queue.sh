#!/bin/bash
# Round-4 master TPU queue: strictly serial, one TPU process at a time.
cd /root/repo
echo "=== drift A/B $(date +%T)"
timeout 3600 python sweeps/r4_drift_ab.py 2>&1 | grep -v WARNING
echo "=== queue3 hetero+calibration $(date +%T)"
bash sweeps/r4_tpu_queue3.sh
echo "=== mixed-lambda NUTS on TPU $(date +%T)"
timeout 5400 python experiments/run_vi_vs_hmc.py --tier mixed --out sweeps/r4_mixed_lambda_tpu.json 2>&1 | tail -3
echo "=== auto-dispatch A/B $(date +%T)"
timeout 3600 python benchmarks/auto_dispatch_check.py 2>&1 | grep -v WARNING
echo "=== column-LRT variance (incl D=8192) $(date +%T)"
timeout 3600 python benchmarks/column_lrt_check.py --sizes 8192 --keys 32 2>&1 | grep -v WARNING
echo "=== digits width 4096 $(date +%T)"
timeout 5400 python experiments/run_mnist.py --data digits --width 4096 --epochs1 5 --epochs2 495 --train-samples 2 2>&1 | tail -2
echo "=== master done $(date +%T)"
echo "=== extra protocol A/B pairs $(date +%T)"
timeout 5400 python sweeps/r4_tpu_queue2c.py 2>&1 | grep -v WARNING
echo "=== master really done $(date +%T)"
