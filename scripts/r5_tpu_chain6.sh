#!/bin/bash
# Round-5 TPU queue, part 6: chain-5 follow-up.
# Chain 5 (runs/r5_tpu_log6.txt) resolved two arms: AUGSUB is a measured
# loser (806 vs ~1025 — per-tile concat relayouts dwarf the subtracts it
# removes; rejected, documented in _augsub_wanted) and PBF16's
# bf16 preferred_element_type fails Mosaic verification on hardware
# ("matmul acc must be 32-bit") — now fixed to convert AFTER the fp32
# drain. DV_BF16's arm died on a tunnel hiccup before compiling.
# This chain: rerun DV_BF16, the fixed PBF16 (under NOMAX), the
# all-candidates combo, and a fresh control.
# Usage: nohup bash scripts/r5_tpu_chain6.sh > runs/r5_tpu_log7.txt 2>&1 &
set -x
cd /root/repo

echo "=== [$(date)] a. b64 DV_BF16=1 (rerun) ==="
MOEGAN_FLASH_DV_BF16=1 timeout 5400 python bench.py --batch 64 || echo "A FAILED"

echo "=== [$(date)] b. b64 NOMAX=1 PBF16=1 (fixed) ==="
MOEGAN_FLASH_NOMAX=1 MOEGAN_FLASH_PBF16=1 timeout 5400 python bench.py --batch 64 || echo "B FAILED"

echo "=== [$(date)] c. b64 NOMAX=1 DV_BF16=1 PBF16=1 ==="
MOEGAN_FLASH_NOMAX=1 MOEGAN_FLASH_DV_BF16=1 MOEGAN_FLASH_PBF16=1 \
  timeout 5400 python bench.py --batch 64 || echo "C FAILED"

echo "=== [$(date)] d. b64 defaults (control) ==="
timeout 5400 python bench.py --batch 64 || echo "D FAILED"

echo "=== [$(date)] e. b64 NOMAX=1 DV_BF16=1 (no pbf16: isolate dv win) ==="
MOEGAN_FLASH_NOMAX=1 MOEGAN_FLASH_DV_BF16=1 \
  timeout 5400 python bench.py --batch 64 || echo "E FAILED"

echo "=== [$(date)] done ==="
