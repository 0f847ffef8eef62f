#!/bin/bash
# Round-5 TPU queue, part 10: measure the length-1 cross-attention
# shortcut (MOEGAN_CROSS_T1, default ON — exact math, see PARITY.md §10)
# and refresh the analysis artifacts at the final round-5 defaults.
# Part A: 3 interleaved pairs, shortcut (default) vs MOEGAN_CROSS_T1=0
# (the literal reference path), b64 reps 5.
# Part B: per-rung attribution + step profile at whatever defaults win,
# so the README tables describe the shipped build.
# Usage: nohup bash scripts/r5_tpu_chain10.sh > runs/r5_tpu_log11.txt 2>&1 &
set -x
cd /root/repo

for i in 1 2 3; do
  echo "=== [$(date)] A$i shortcut ON (default, b64, reps 5) ==="
  timeout 5400 python bench.py --batch 64 --reps 5 || echo "A$i-on FAILED"
  echo "=== [$(date)] A$i shortcut OFF (literal path, b64, reps 5) ==="
  MOEGAN_CROSS_T1=0 timeout 5400 python bench.py --batch 64 --reps 5 || echo "A$i-off FAILED"
done

echo "=== [$(date)] B1 b128 confirmation at defaults ==="
timeout 5400 python bench.py --batch 128 --reps 5 || echo "B1 FAILED"

echo "=== [$(date)] B2 per-rung attribution at final defaults ==="
timeout 3600 python scripts/rung_attribution.py --batch 64 || echo "B2 FAILED"

echo "=== [$(date)] B3 bench + full step profile (MFU) at final defaults ==="
IPS=$(timeout 5400 python bench.py --batch 64 --reps 5 2>/dev/null | tail -1 \
      | python -c "import json,sys; print(json.load(sys.stdin)['value'])") \
  || echo "B3-bench FAILED"
echo "B3 imgs/s/chip = $IPS"
timeout 3600 python scripts/step_profile.py --batch 64 --imgs-per-sec "$IPS" || echo "B3 FAILED"

echo "=== [$(date)] done ==="
