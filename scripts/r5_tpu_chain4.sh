#!/bin/bash
# Round-5 TPU queue, part 4: the shift-free-softmax forward (NOMAX) A/B
# + an HLO traffic refresh at the final defaults.
# NOMAX drops the row-max reduce AND the broadcast subtract from every
# forward score tile (softmax is shift-invariant; exp2 shifts are exact
# in fp32) — the last two shavable VPU passes in the VPU-bound res-64
# forward. Interleaved 2 runs/arm against the ±12 imgs/s noise band.
#   a. hlo_traffic at final defaults (hunt the <=16-rung 12 GB/step)
#   b. b64 NOMAX=1        d. repeat b
#   c. b64 defaults       e. repeat c
# Usage: nohup bash scripts/r5_tpu_chain4.sh > runs/r5_tpu_log5.txt 2>&1 &
set -x
cd /root/repo

echo "=== [$(date)] a. hlo_traffic at final defaults ==="
timeout 3600 python scripts/hlo_traffic.py --batch 64 --top 25 || echo "A FAILED"

echo "=== [$(date)] b. b64 NOMAX=1 ==="
MOEGAN_FLASH_NOMAX=1 timeout 5400 python bench.py --batch 64 || echo "B FAILED"

echo "=== [$(date)] c. b64 defaults ==="
timeout 5400 python bench.py --batch 64 || echo "C FAILED"

echo "=== [$(date)] d. b64 NOMAX=1 (repeat) ==="
MOEGAN_FLASH_NOMAX=1 timeout 5400 python bench.py --batch 64 || echo "D FAILED"

echo "=== [$(date)] e. b64 defaults (repeat) ==="
timeout 5400 python bench.py --batch 64 || echo "E FAILED"

echo "=== [$(date)] done ==="
