#!/bin/bash
# Round-3 TPU queue, part 8: close the bisection matrix.
#   a. current defaults (two-tap upsample, fused QKV, MIN_T=256, 1x1 matmul)
#   b. a but jax.image.resize upsample (MOEGAN_FAST_UPSAMPLE=0)
# Chain7 already measured (on the same code): MIN_T=1024 -> 907,
# 1X1_MATMUL=0 -> 945.7; (pre-upsample code): defaults 946.6, split QKV 932.3.
# Usage: nohup bash scripts/r3_tpu_chain8.sh > runs/r3_tpu_log8.txt 2>&1 &
set -x
cd /root/repo

echo "=== [$(date)] a. current defaults ==="
timeout 3600 python bench.py --batch 64 || echo "A FAILED"

echo "=== [$(date)] b. MOEGAN_FAST_UPSAMPLE=0 ==="
MOEGAN_FAST_UPSAMPLE=0 timeout 3600 python bench.py --batch 64 || echo "B FAILED"

echo "=== [$(date)] done ==="
