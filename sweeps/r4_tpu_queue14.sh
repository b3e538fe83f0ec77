#!/bin/bash
# Round-4 queue #14: does per-example column LRT improve the tuned
# yacht recipe? (the 128->1 output head is a transposed column layer
# and the recipe already uses per-example noise everywhere else)
cd /root/repo
run() { name=$1; shift; echo "=== $name $(date +%T)"; timeout 5400 python experiments/run_uci.py yacht --quiet --splits 8 --bias --train-samples 8 --per-example-noise --sigma0 0.1 --ckpt-dir /tmp/r4q14/$name "$@" 2>/dev/null | tail -1; }
run yacht_base
run yacht_collrt --column-lrt
echo "=== energy A/B $(date +%T)"
run2() { name=$1; shift; echo "=== $name $(date +%T)"; timeout 5400 python experiments/run_uci.py energy --quiet --splits 8 --bias --train-samples 4 --per-example-noise --sigma0 0.1 --normalize-y --kl-warmup-frac 0.4 --ckpt-dir /tmp/r4q14/$name "$@" 2>/dev/null | tail -1; }
run2 energy_base
run2 energy_collrt --column-lrt
echo "=== done $(date +%T)"
