#!/bin/bash
# Round-3 serialized TPU work queue. ONE chain, run in background; never
# run concurrent XLA compiles on this 1-CPU host (see memory notes).
# Usage: bash scripts/r3_tpu_chain.sh >> runs/r3_tpu_log.txt 2>&1 &
set -x
cd /root/repo
mkdir -p runs

echo "=== [$(date)] 1. component attribution (block_bench b64) ==="
timeout 3600 python scripts/block_bench.py --batch 64 || echo "BLOCK_BENCH FAILED"

echo "=== [$(date)] 2. flagship bench, s2d OFF (round-2 regression check) ==="
MOEGAN_S2D_CONV=0 timeout 3600 python bench.py --batch 64 || echo "BENCH-S2D0 FAILED"

echo "=== [$(date)] 3. flagship bench, s2d ON ==="
MOEGAN_S2D_CONV=1 timeout 3600 python bench.py --batch 64 || echo "BENCH-S2D1 FAILED"

echo "=== [$(date)] 4. with-CLIP bench (batched multi-tap tower) ==="
timeout 3600 python bench.py --batch 64 --with-clip || echo "BENCH-CLIP FAILED"

echo "=== [$(date)] done ==="
