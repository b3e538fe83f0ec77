#!/bin/bash
# r4 queue 1: vmapped-vs-sequential UCI protocol on the v5e (VERDICT #1)
cd /root/repo
echo "=== vmapped yacht 500 epochs ==="
python experiments/run_uci.py yacht --epochs1 50 --epochs2 450 --quiet --ckpt-dir /tmp/r4_tpu_vm
echo "=== sequential yacht 500 epochs ==="
python experiments/run_uci.py yacht --epochs1 50 --epochs2 450 --quiet --sequential-splits --ckpt-dir /tmp/r4_tpu_seq
