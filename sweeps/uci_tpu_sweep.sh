#!/bin/bash
# TPU UCI sweep: remaining yacht quality configs (4 splits each) + the
# unfinished concrete tuned 8-split run. Sequential — one TPU job at a
# time (remote-compile contention, CLAUDE.md).
cd /root/repo
BASE="--splits 4 --quiet"
run() { name=$1; shift; echo "=== $name"; timeout 3000 python experiments/run_uci.py $BASE "$@" 2>/dev/null | tail -1; }
run yacht_B_normy  yacht --ckpt-dir /tmp/tpusweep/yB --train-samples 4 --per-example-noise --sigma0 0.3 --normalize-y
run yacht_D_long   yacht --ckpt-dir /tmp/tpusweep/yD --train-samples 4 --per-example-noise --sigma0 0.3 --epochs2 100000
run yacht_E_s8     yacht --ckpt-dir /tmp/tpusweep/yE --train-samples 8 --per-example-noise --sigma0 0.3
run yacht_F_het    yacht --ckpt-dir /tmp/tpusweep/yF --train-samples 4 --per-example-noise --sigma0 0.3 --heteroscedastic
run yacht_C_warm4  yacht --ckpt-dir /tmp/tpusweep/yC --train-samples 4 --per-example-noise --sigma0 0.3 --kl-warmup-frac 0.4
echo "=== concrete_tuned (8 splits)"
timeout 3000 python experiments/run_uci.py concrete --splits 8 --quiet \
  --ckpt-dir /tmp/tpusweep/c8 --train-samples 4 --per-example-noise --sigma0 0.3 \
  2>/dev/null | tail -1
