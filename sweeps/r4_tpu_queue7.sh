#!/bin/bash
# Round-4 queue #7: mixed-lambda NUTS on the v5e at the study's actual
# config (epochs=8000 — the r3 json was produced with the function
# default, not main's 12000; see RESULTS round 4) + draws/s.
cd /root/repo
echo "=== mixed-lambda NUTS TPU epochs=8000 $(date +%T)"
timeout 5400 python experiments/run_vi_vs_hmc.py --tier mixed --epochs 8000 --out sweeps/r4_mixed_lambda_tpu_e8000.json 2>&1 | tail -2
echo "=== done $(date +%T)"
