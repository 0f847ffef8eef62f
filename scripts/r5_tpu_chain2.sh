#!/bin/bash
# Round-5 TPU queue, part 2: 2x2 A/B — fused softmax denominator x exp2.
# Chain-1 surprise: with the q pre-scale in place, exp2=0 benched 1021.81
# vs exp2=1's 1009.44 (runs/r5_tpu_log1.txt) — the pre-scale removed the
# scale multiply exp2 used to piggyback on, so exp2's round-4 edge may be
# gone (both arms differ only in the transcendental + a bwd ln2 multiply).
# Delta is ~the +-12 noise band; settle both defaults with fresh data.
# MOEGAN_FLASH_FUSED_L=1 appends a ones column to V inside the forward
# kernel so l rides the PV matmul's spare output lanes (32 of 128 used at
# C=32) instead of a cross-lane VPU sum-reduce per score tile.
#   a. fused_l=1 exp2=1    b. fused_l=1 exp2=0
#   c. fused_l=0 exp2=1    d. fused_l=0 exp2=0
# Usage: nohup bash scripts/r5_tpu_chain2.sh > runs/r5_tpu_log2.txt 2>&1 &
set -x
cd /root/repo

echo "=== [$(date)] a. b64 FUSED_L=1 EXP2=1 ==="
MOEGAN_FLASH_FUSED_L=1 MOEGAN_FLASH_EXP2=1 timeout 5400 python bench.py --batch 64 || echo "A FAILED"

echo "=== [$(date)] b. b64 FUSED_L=1 EXP2=0 ==="
MOEGAN_FLASH_FUSED_L=1 MOEGAN_FLASH_EXP2=0 timeout 5400 python bench.py --batch 64 || echo "B FAILED"

echo "=== [$(date)] c. b64 FUSED_L=0 EXP2=1 ==="
MOEGAN_FLASH_FUSED_L=0 MOEGAN_FLASH_EXP2=1 timeout 5400 python bench.py --batch 64 || echo "C FAILED"

echo "=== [$(date)] d. b64 FUSED_L=0 EXP2=0 ==="
MOEGAN_FLASH_FUSED_L=0 MOEGAN_FLASH_EXP2=0 timeout 5400 python bench.py --batch 64 || echo "D FAILED"

echo "=== [$(date)] done ==="
