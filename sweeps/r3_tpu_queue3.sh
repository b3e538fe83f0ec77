#!/bin/bash
# Round-3 TPU queue #3: re-measure the round-2 rows the MFU audit
# flagged, at their EXACT original configs, with repeats:
# - large-D training table (batch 128, 4 MC samples, D=16384/32768) --
#   round-2 published 0.39 ms / 2543 steps/s at D=16384, which the
#   queue-1 re-measure (batch 256 / s8: 3.54 ms) says is ~4x too fast
# - serving rows (batch 256, 64 MC samples, D=4096/8192) -- round-2
#   published 12.5M / 6.1M pred-samples/s
# - D=8192 training row (batch 256, 8 samples) for the mid point
# - headline bench refresh (now reports all runs + spread)
cd /root/repo
echo "=== train_default_corrected_flops $(date +%T)"
timeout 3000 python experiments/run_scaling.py --sizes 4096 16384 \
  --repeats 2 2>/dev/null
echo "=== train_highest_corrected_flops $(date +%T)"
timeout 3000 python experiments/run_scaling.py --sizes 4096 16384 \
  --precision highest --repeats 1 2>/dev/null
echo "=== train_bf16_activations $(date +%T)"
timeout 3000 python experiments/run_scaling.py --sizes 4096 16384 \
  --dtype bf16 --repeats 2 2>/dev/null
echo "=== largeD_exact_old_config $(date +%T)"
timeout 3600 python experiments/run_scaling.py --sizes 16384 32768 \
  --batch 128 --samples 4 --repeats 3 2>/dev/null
echo "=== train_8192_x2 $(date +%T)"
timeout 3000 python experiments/run_scaling.py --sizes 8192 \
  --repeats 2 2>/dev/null
echo "=== serving_exact_old_config $(date +%T)"
timeout 3600 python experiments/run_scaling.py --predict --sizes 4096 8192 \
  --samples 64 --repeats 3 2>/dev/null
echo "=== bench_headline $(date +%T)"
timeout 2400 python bench.py 2>/dev/null
echo "=== done $(date +%T)"
