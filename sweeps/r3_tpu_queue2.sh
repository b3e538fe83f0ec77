#!/bin/bash
# Round-3 TPU queue #2: heteroscedastic likelihood on REAL data (VERDICT
# weak #4 — round 2 had synthetic-only results for BASELINE config 3),
# and the kin8nm-scale protocol feasibility run (missing #3: the
# reference took 35 h/split at this shape, report/model-testing.tex:92).
cd /root/repo
run() { name=$1; ds=$2; shift 2; echo "=== $name $(date +%T)"; timeout 5400 python experiments/run_uci.py $ds --quiet --ckpt-dir /tmp/r3q2/$name "$@" 2>/dev/null | tail -1; }
run H_energy8_normy   energy   --splits 8 --bias --train-samples 4 --per-example-noise --normalize-y --heteroscedastic
run H_concrete8_normy concrete --splits 8 --bias --train-samples 8 --per-example-noise --normalize-y --heteroscedastic
run H_energy4_raw     energy   --splits 4 --bias --train-samples 4 --per-example-noise --heteroscedastic
echo "=== kin8nm_scale_feasibility $(date +%T)"
timeout 5400 python experiments/run_protocol_feasibility.py 2>/dev/null | tail -1
echo "=== done $(date +%T)"
