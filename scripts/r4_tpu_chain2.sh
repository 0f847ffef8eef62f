#!/bin/bash
# Round-4 TPU queue, part 2 — run after r4_tpu_chain1.sh completes:
#   a. compact-lse A/B RE-TRIAL (chain-1 item b failed on a Mosaic tiling
#      bug at the multi-q-tile shape; fixed — whole compact block per bh,
#      per-tile row-slice writes)
#   b. MoE-bwd-VMEM RE-TRIAL at 24 MB (chain-1 item c failed at 10 MB:
#      true scoped footprint of the C=256 v2 backward is 18.79 MB > the
#      16 MB default Mosaic limit; budgets > 16 MB now raise
#      vmem_limit_bytes so the trial can actually compile)
#   c. per-rung attribution at the final build (VERDICT #2)
#   d. tpu_flagship preset bench + attribution (VERDICT #7 evidence)
#   e. demo refresh at round-3 defaults, 20 epochs (VERDICT #4)
#   f. serving transcript against the fresh demo checkpoint (VERDICT #4)
#   g. 10k FID/CLIPScore eval refresh + 64x64 soft-vs-hard histogram
#      (VERDICT #4 / weak #4)
#   h. conditioning demo: toy embedder + 16x16 GAN, 40 epochs (VERDICT #5)
# Usage: nohup bash scripts/r4_tpu_chain2.sh > runs/r4_tpu_log2.txt 2>&1 &
set -x
cd /root/repo

echo "=== [$(date)] a. compact-lse re-trial (fixed layout) ==="
MOEGAN_FLASH_COMPACT_LSE=1 timeout 3600 python bench.py --batch 64 || echo "A FAILED"

echo "=== [$(date)] b. MoE-bwd-VMEM=24 re-trial (raised Mosaic limit) ==="
MOEGAN_MOE_BWD_VMEM_MB=24 timeout 3600 python bench.py --batch 64 || echo "B FAILED"

echo "=== [$(date)] c. per-rung attribution, final build ==="
timeout 3600 python scripts/rung_attribution.py --batch 64 \
  --out runs/rung_attribution.json || echo "C FAILED"

echo "=== [$(date)] d. tpu_flagship preset bench + attribution ==="
timeout 3600 python bench.py --batch 64 --config tpu_flagship || echo "D1 FAILED"
timeout 3600 python scripts/rung_attribution.py --batch 64 --config tpu_flagship \
  --out runs/rung_attribution_flagship.json || echo "D2 FAILED"

echo "=== [$(date)] e. demo refresh (20 epochs, round-3 defaults) ==="
timeout 7200 python scripts/demo_train.py 20 || echo "E FAILED"

echo "=== [$(date)] f. serving transcript ==="
timeout 1800 python scripts/serving_transcript.py --model-dir runs/demo || echo "F FAILED"

echo "=== [$(date)] g. eval refresh (10k FID/CLIPScore + routing histogram) ==="
timeout 10800 python scripts/eval_run.py --num_samples 10000 || echo "G FAILED"

echo "=== [$(date)] h. conditioning demo (toy embedder, 40 epochs) ==="
timeout 10800 python scripts/conditioning_demo.py 40 || echo "H FAILED"

echo "=== [$(date)] done ==="
