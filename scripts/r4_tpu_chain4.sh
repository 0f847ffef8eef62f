#!/bin/bash
# Round-4 TPU queue, part 4. Chain 3 completed items a-d (VMEM=24 trial
# 989.43, per-rung attribution x2, tpu_flagship bench 532.13, demo
# refresh); its controller was stopped before e-g so the redesigned
# compact-lse kernel (identity-matmul relayout) could be A/B'd first:
#   a. compact-lse A/B on hardware (VERDICT #1 — the Mosaic failure is
#      fixed in the working tree; AOT lowering already verified)
#   b. block-level attribution of the res-64 rung (VERDICT #2 — both
#      rung attributions put 85-92% of the roofline gap there)
#   c. serving transcript against the fresh demo ckpt (VERDICT #4)
#   d. 10k FID/CLIPScore eval refresh + 64x64 soft-vs-hard histogram
#      (VERDICT #4 / weak #4)
#   e. conditioning demo: toy embedder + 16x16 GAN, 40 epochs (VERDICT #5)
# Usage: nohup bash scripts/r4_tpu_chain4.sh > runs/r4_tpu_log4.txt 2>&1 &
set -x
cd /root/repo

echo "=== [$(date)] a. compact-lse A/B (redesigned kernel) ==="
MOEGAN_FLASH_COMPACT_LSE=1 timeout 3600 python bench.py --batch 64 || echo "A FAILED"

echo "=== [$(date)] b. block-level attribution at res 64 ==="
timeout 3600 python scripts/block_bench.py --batch 64 --res 64 32 || echo "B FAILED"

echo "=== [$(date)] c. serving transcript ==="
timeout 1800 python scripts/serving_transcript.py --model-dir runs/demo || echo "C FAILED"

echo "=== [$(date)] d. eval refresh (10k FID/CLIPScore + routing histogram) ==="
timeout 10800 python scripts/eval_run.py --num_samples 10000 || echo "D FAILED"

echo "=== [$(date)] e. conditioning demo (toy embedder, 40 epochs) ==="
timeout 10800 python scripts/conditioning_demo.py 40 || echo "E FAILED"

echo "=== [$(date)] done ==="
