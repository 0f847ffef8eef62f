#!/bin/bash
# Round-5 TPU queue, part 7: replicate the DV_BF16 win before promotion.
# Chain 6 (runs/r5_tpu_log7.txt): DV_BF16 alone 1073.0 — but
# NOMAX+DV_BF16 1034.7 and NOMAX+DV_BF16+PBF16 1026.4 against a 1030.3
# control, which should compose (NOMAX is forward-only, DV_BF16
# backward-only). Either 1073 is an outlier or the dv win is real and
# the NOMAX arms mask it; interleaved repeats settle it. NOMAX/PBF16
# showed no measurable edge of their own (+10 trend inside the +-12
# band across 4 pairings) and stay opt-in regardless.
# Usage: nohup bash scripts/r5_tpu_chain7.sh > runs/r5_tpu_log8.txt 2>&1 &
set -x
cd /root/repo

echo "=== [$(date)] a. b64 DV_BF16=1 (repeat 1) ==="
MOEGAN_FLASH_DV_BF16=1 timeout 5400 python bench.py --batch 64 || echo "A FAILED"

echo "=== [$(date)] b. b64 defaults (control) ==="
timeout 5400 python bench.py --batch 64 || echo "B FAILED"

echo "=== [$(date)] c. b64 DV_BF16=1 (repeat 2) ==="
MOEGAN_FLASH_DV_BF16=1 timeout 5400 python bench.py --batch 64 || echo "C FAILED"

echo "=== [$(date)] d. b128 DV_BF16=1 ==="
MOEGAN_FLASH_DV_BF16=1 timeout 5400 python bench.py --batch 128 || echo "D FAILED"

echo "=== [$(date)] e. b64 DV_BF16=1 (repeat 3) ==="
MOEGAN_FLASH_DV_BF16=1 timeout 5400 python bench.py --batch 64 || echo "E FAILED"

echo "=== [$(date)] done ==="
