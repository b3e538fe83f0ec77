#!/bin/bash
# Round-4 queue #6: digits width-4096 tuning (beat the width-1024 0.972
# baseline — VERDICT #8 done criterion).
cd /root/repo
run() { name=$1; shift; echo "=== $name $(date +%T)"; timeout 3600 python experiments/run_mnist.py --data digits --width 4096 "$@" 2>&1 | tail -1; }
run w4096_bias       --epochs1 5 --epochs2 495 --train-samples 2 --bias
run w4096_lam10      --epochs1 5 --epochs2 495 --train-samples 2 --bias --lambda-hidden 10 --lambda-last 3
run w4096_s4         --epochs1 5 --epochs2 495 --train-samples 4 --bias
echo "=== done $(date +%T)"
