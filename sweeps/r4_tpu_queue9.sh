#!/bin/bash
# Round-4 queue #9: (a) kin8nm-scale 8-split protocol through the
# vmapped accelerator (protocol-MFU before/after row), (b) headline
# bench sanity on current code, (c) D=4096 train-step regression check.
cd /root/repo
echo "=== kin8nm-scale 8 splits vmapped $(date +%T)"
timeout 7200 python experiments/run_protocol_feasibility.py --splits 8 2>&1 | tail -1
echo "=== bench sanity $(date +%T)"
timeout 1200 python bench.py 2>&1 | tail -1
echo "=== D=4096 step regression check $(date +%T)"
timeout 2400 python experiments/run_scaling.py --sizes 4096 --steps 50 2>&1 | tail -3
echo "=== done $(date +%T)"
