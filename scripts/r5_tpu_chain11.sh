#!/bin/bash
# Round-5 TPU queue, part 11: trimmed re-run of chain 10 (which aborted
# when the MOEGAN_CROSS_T1 commit landed mid-chain, runs/r5_tpu_log10.txt).
# Stable tree this time. Two interleaved pairs instead of three and
# reps 3 instead of 5 so the A/B + artifact refresh fits one session;
# log10's A1-control (1035.11 b64 reps5, pre-shortcut code) is a third
# independent OFF-arm reading.
# Part A: shortcut (default ON) vs MOEGAN_CROSS_T1=0 (literal reference
# path), b64. Part B: b128 confirmation + per-rung attribution + step
# profile at the final defaults, so the README tables describe the
# shipped build.
# Usage: nohup bash scripts/r5_tpu_chain11.sh > runs/r5_tpu_log11.txt 2>&1 &
set -x
cd /root/repo

for i in 1 2; do
  echo "=== [$(date)] A$i shortcut ON (default, b64) ==="
  timeout 1800 python bench.py --batch 64 || echo "A$i-on FAILED"
  echo "=== [$(date)] A$i shortcut OFF (literal path, b64) ==="
  MOEGAN_CROSS_T1=0 timeout 1800 python bench.py --batch 64 || echo "A$i-off FAILED"
done

echo "=== [$(date)] B1 b128 confirmation at defaults ==="
timeout 1800 python bench.py --batch 128 || echo "B1 FAILED"

echo "=== [$(date)] B2 per-rung attribution at final defaults ==="
timeout 3600 python scripts/rung_attribution.py --batch 64 || echo "B2 FAILED"

echo "=== [$(date)] B3 bench + full step profile (MFU) at final defaults ==="
IPS=$(timeout 1800 python bench.py --batch 64 2>/dev/null | tail -1 \
      | python -c "import json,sys; print(json.load(sys.stdin)['value'])") \
  || echo "B3-bench FAILED"
echo "B3 imgs/s/chip = $IPS"
timeout 3600 python scripts/step_profile.py --batch 64 --imgs-per-sec "$IPS" || echo "B3 FAILED"

echo "=== [$(date)] done ==="
