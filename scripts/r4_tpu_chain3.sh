#!/bin/bash
# Round-4 TPU queue, part 3 — chain 2 died with the previous builder
# session right after its item (a) failed; this re-runs everything that
# never completed, cheapest/most-driver-critical first:
#   a. MoE-bwd-VMEM=24 re-trial (raised Mosaic limit, 9e532a3)
#   b. per-rung attribution at the final build (VERDICT #2)
#   c. tpu_flagship preset bench + attribution (VERDICT #7)
#   d. demo refresh at round-3 defaults, 20 epochs (VERDICT #4)
#   e. serving transcript against the fresh demo checkpoint (VERDICT #4)
#   f. 10k FID/CLIPScore eval refresh + 64x64 soft-vs-hard histogram
#      (VERDICT #4 / weak #4)
#   g. conditioning demo: toy embedder + 16x16 GAN, 40 epochs (VERDICT #5)
# compact-lse is NOT here: its Mosaic failure needs a layout redesign
# first (runs/r4_tpu_log2.txt); it gets its own chain once fixed.
# Usage: nohup bash scripts/r4_tpu_chain3.sh > runs/r4_tpu_log3.txt 2>&1 &
set -x
cd /root/repo

echo "=== [$(date)] a. MoE-bwd-VMEM=24 re-trial (raised Mosaic limit) ==="
MOEGAN_MOE_BWD_VMEM_MB=24 timeout 3600 python bench.py --batch 64 || echo "A FAILED"

echo "=== [$(date)] b. per-rung attribution, final build ==="
timeout 3600 python scripts/rung_attribution.py --batch 64 \
  --out runs/rung_attribution.json || echo "B FAILED"

echo "=== [$(date)] c. tpu_flagship preset bench + attribution ==="
timeout 3600 python bench.py --batch 64 --config tpu_flagship || echo "C1 FAILED"
timeout 3600 python scripts/rung_attribution.py --batch 64 --config tpu_flagship \
  --out runs/rung_attribution_flagship.json || echo "C2 FAILED"

echo "=== [$(date)] d. demo refresh (20 epochs, round-3 defaults) ==="
timeout 7200 python scripts/demo_train.py 20 || echo "D FAILED"

echo "=== [$(date)] e. serving transcript ==="
timeout 1800 python scripts/serving_transcript.py --model-dir runs/demo || echo "E FAILED"

echo "=== [$(date)] f. eval refresh (10k FID/CLIPScore + routing histogram) ==="
timeout 10800 python scripts/eval_run.py --num_samples 10000 || echo "F FAILED"

echo "=== [$(date)] g. conditioning demo (toy embedder, 40 epochs) ==="
timeout 10800 python scripts/conditioning_demo.py 40 || echo "G FAILED"

echo "=== [$(date)] done ==="
