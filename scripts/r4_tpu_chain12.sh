#!/bin/bash
# Round-4 TPU queue, part 12: refresh the README analysis tables at the
# FINAL shipped defaults (block_k=4096 et al).
#   a. per-rung attribution (parity, b64) -> runs/rung_attribution.json
#   b. step profile (b64) for the MFU table row
# Usage: nohup bash scripts/r4_tpu_chain12.sh > runs/r4_tpu_log12.txt 2>&1 &
set -x
cd /root/repo

echo "=== [$(date)] a. rung attribution, final defaults ==="
timeout 5400 python scripts/rung_attribution.py --batch 64 --out runs/rung_attribution.json || echo "A FAILED"

echo "=== [$(date)] b. step profile, final defaults ==="
timeout 3600 python scripts/step_profile.py --batch 64 --imgs-per-sec 1011.88 || echo "B FAILED"

echo "=== [$(date)] done ==="
