#!/bin/bash
# Round-5 TPU queue, part 8: settle DV_BF16 at b128 + final-defaults
# confirmation. Chain 7 (runs/r5_tpu_log8.txt): DV_BF16 has NO b64
# effect (1035.3/1027.7/1035.0 vs interleaved control 1033.0; chain-6's
# 1073.0 was an outlier — observed single-run spread reaches +40), but
# its one b128 sample (1042.9) sits +26 above the 1014-1017 historical
# b128 band. This chain replicates b128 both-arms interleaved, then
# takes the round-5 final-defaults b64 confirmation + step profile.
# Usage: nohup bash scripts/r5_tpu_chain8.sh > runs/r5_tpu_log9.txt 2>&1 &
set -x
cd /root/repo

echo "=== [$(date)] a. b128 defaults (control) ==="
timeout 5400 python bench.py --batch 128 || echo "A FAILED"

echo "=== [$(date)] b. b128 DV_BF16=1 (repeat) ==="
MOEGAN_FLASH_DV_BF16=1 timeout 5400 python bench.py --batch 128 || echo "B FAILED"

echo "=== [$(date)] c. b128 defaults (control 2) ==="
timeout 5400 python bench.py --batch 128 || echo "C FAILED"

echo "=== [$(date)] d. b64 defaults (round-5 final confirmation) ==="
timeout 5400 python bench.py --batch 64 || echo "D FAILED"

echo "=== [$(date)] e. step profile at final defaults ==="
timeout 3600 python scripts/step_profile.py --batch 64 || echo "E FAILED"

echo "=== [$(date)] done ==="
