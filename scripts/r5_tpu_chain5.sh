#!/bin/bash
# Round-5 TPU queue, part 5: the backward micro-opt flags A/B.
#   DV_BF16 — the backward's dv dot in bf16 (the ONE fp32 MXU dot in the
#             path; fp32 matmul is ~4x the MXU passes of bf16 at equal fill)
#   AUGSUB  — the backward's -lse / -delta broadcast subtracts folded into
#             the score/dp matmuls as augmented columns (K 32->33, free at
#             the 25% fill)
#   PBF16   — scores drained bf16 from the MXU + exp2 on packed bf16
#             (fwd under NOMAX only, bwd always)
# Each arm vs the chain-4 defaults control; NOMAX rides the PBF16 arms
# (required by the fwd gate). Noise band is +-12 imgs/s; winners get
# repeats in chain 6.
# Usage: nohup bash scripts/r5_tpu_chain5.sh > runs/r5_tpu_log6.txt 2>&1 &
set -x
cd /root/repo

echo "=== [$(date)] a. b64 DV_BF16=1 ==="
MOEGAN_FLASH_DV_BF16=1 timeout 5400 python bench.py --batch 64 || echo "A FAILED"

echo "=== [$(date)] b. b64 AUGSUB=1 ==="
MOEGAN_FLASH_AUGSUB=1 timeout 5400 python bench.py --batch 64 || echo "B FAILED"

echo "=== [$(date)] c. b64 NOMAX=1 PBF16=1 ==="
MOEGAN_FLASH_NOMAX=1 MOEGAN_FLASH_PBF16=1 timeout 5400 python bench.py --batch 64 || echo "C FAILED"

echo "=== [$(date)] d. b64 all (NOMAX+DV_BF16+AUGSUB+PBF16) ==="
MOEGAN_FLASH_NOMAX=1 MOEGAN_FLASH_DV_BF16=1 MOEGAN_FLASH_AUGSUB=1 MOEGAN_FLASH_PBF16=1 \
  timeout 5400 python bench.py --batch 64 || echo "D FAILED"

echo "=== [$(date)] e. b64 defaults (control) ==="
timeout 5400 python bench.py --batch 64 || echo "E FAILED"

echo "=== [$(date)] done ==="
