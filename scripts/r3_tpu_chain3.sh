#!/bin/bash
# Round-3 TPU queue, part 3: confirm the new auto defaults on the real
# chip (s2d auto now OFF after chain2 showed it hurts end-to-end), probe
# the remaining flash-tile combo, and repeat the shared_fake convergence
# A/B at 2 more seeds for a seed-robust default decision.
# Usage: nohup bash scripts/r3_tpu_chain3.sh > runs/r3_tpu_log3.txt 2>&1 &
set -x
cd /root/repo

echo "=== [$(date)] a. flagship bench: pure defaults (v2 auto, s2d auto=off) ==="
timeout 3600 python bench.py --batch 64 || echo "BENCH-DEFAULT FAILED"

echo "=== [$(date)] b. flagship bench: defaults + flash block_k=1024 ==="
MOEGAN_FLASH_BK=1024 timeout 3600 python bench.py --batch 64 || echo "BENCH-BK FAILED"

echo "=== [$(date)] c. shared_fake A/B seed 1 ==="
timeout 7200 python scripts/shared_fake_ab.py 20 1 || echo "AB-S1 FAILED"

echo "=== [$(date)] d. shared_fake A/B seed 2 ==="
timeout 7200 python scripts/shared_fake_ab.py 20 2 || echo "AB-S2 FAILED"

echo "=== [$(date)] done ==="
