#!/bin/bash
# Round-4 queue #12: classification calibration (ECE + logit
# temperature) at real configs + diabetes calibrated regression.
cd /root/repo
echo "=== digits w1024 calibrated $(date +%T)"
timeout 3600 python experiments/run_mnist.py --data digits --width 1024 --epochs1 5 --epochs2 495 --train-samples 2 --calibrate 2>&1 | tail -1
echo "=== digits w4096 calibrated $(date +%T)"
timeout 3600 python experiments/run_mnist.py --data digits --width 4096 --epochs1 5 --epochs2 495 --train-samples 4 --bias --calibrate 2>&1 | tail -1
echo "=== diabetes calibrated $(date +%T)"
timeout 5400 python experiments/run_uci.py diabetes --quiet --splits 8 --bias --train-samples 8 --per-example-noise --sigma0 0.1 --normalize-y --kl-warmup-frac 0.4 --calibrate --calib-frac 0.15 --ckpt-dir /tmp/r4q12/diab 2>/dev/null | tail -1
echo "=== done $(date +%T)"
