#!/bin/bash
# Round-5 TPU queue, part 1: confirm the two round-5 flash-kernel changes.
#   1. MOEGAN_FLASH_EXP2 default flipped to ON (round-4 A/B: 1010.05 vs
#      995.20, runs/r4_tpu_log13.txt) with the flag now bound statically
#      at the flash_attention call (advisor fix).
#   2. Softmax scale folded into q OUTSIDE the kernels: removes a
#      [block_q, block_k] VPU multiply per score tile from the forward,
#      the VJP forward, and the backward recompute (3 full T x T passes
#      per step at res 64), replaced by one [T, D] multiply.
#   a. bench b64, new defaults (exp2 + prescale)
#   b. bench b64, MOEGAN_FLASH_EXP2=0 (prescale alone vs round-4's 995.20)
#   c. bench b128, new defaults
# Usage: nohup bash scripts/r5_tpu_chain1.sh > runs/r5_tpu_log1.txt 2>&1 &
set -x
cd /root/repo

echo "=== [$(date)] a. bench b64, new defaults (exp2 ON + q-prescale) ==="
timeout 5400 python bench.py --batch 64 || echo "A FAILED"

echo "=== [$(date)] b. bench b64, MOEGAN_FLASH_EXP2=0 (prescale alone) ==="
MOEGAN_FLASH_EXP2=0 timeout 5400 python bench.py --batch 64 || echo "B FAILED"

echo "=== [$(date)] c. bench b128, new defaults ==="
timeout 5400 python bench.py --batch 128 || echo "C FAILED"

echo "=== [$(date)] done ==="
