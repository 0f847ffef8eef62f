#!/bin/bash
# Round-3 TPU queue, part 2: convergence A/B + FID/CLIPScore protocol rerun
# (the round-2 eval artifact was computed with the Inception tower that
# skipped Mixed_6e — fixed in round 3, so the numbers must be refreshed).
# Usage: nohup bash scripts/r3_tpu_chain2.sh > runs/r3_tpu_log2.txt 2>&1 &
set -x
cd /root/repo

echo "=== [$(date)] 0a. flagship bench: v2 MoE kernel, s2d OFF (isolate v2) ==="
MOEGAN_S2D_CONV=0 MOEGAN_MOE_KERNEL=v2 timeout 3600 python bench.py --batch 64 || echo "BENCH-V2 FAILED"

echo "=== [$(date)] 0b. flagship bench: v2 MoE kernel + s2d conv (both) ==="
MOEGAN_S2D_CONV=1 MOEGAN_MOE_KERNEL=v2 timeout 3600 python bench.py --batch 64 || echo "BENCH-V2S2D FAILED"

echo "=== [$(date)] 0c. flagship bench: v2 + s2d + flash block_k=1024 ==="
MOEGAN_S2D_CONV=1 MOEGAN_MOE_KERNEL=v2 MOEGAN_FLASH_BK=1024 \
  timeout 3600 python bench.py --batch 64 || echo "BENCH-BK1024 FAILED"

echo "=== [$(date)] 1. shared_fake convergence A/B (20 epochs x 2 arms) ==="
timeout 7200 python scripts/shared_fake_ab.py 20 || echo "AB FAILED"

echo "=== [$(date)] 2. FID-10k / CLIPScore rerun with fixed Inception ==="
timeout 7200 python scripts/eval_run.py --model_path runs/eval/ckpt.msgpack \
    --num_samples 10000 || echo "EVAL FAILED"

echo "=== [$(date)] done ==="
