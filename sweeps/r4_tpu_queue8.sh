#!/bin/bash
cd /root/repo
echo "=== w8192_s4 $(date +%T)"
timeout 3600 python experiments/run_mnist.py --data digits --width 8192 --epochs1 5 --epochs2 495 --train-samples 4 --bias 2>&1 | tail -1
bash sweeps/r4_tpu_queue7.sh
echo "=== q8 done $(date +%T)"
