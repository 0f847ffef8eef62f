#!/bin/bash
# Round-3 TPU queue, part 5: bench the NEW default (reference-exact
# shared_fake=False) at b64 and b128, rank HBM buffers of the default
# step for the next traffic cut, then re-run the cost attribution with
# the measured (not borrowed) throughput.
# Usage: nohup bash scripts/r3_tpu_chain5.sh > runs/r3_tpu_log5.txt 2>&1 &
set -x
cd /root/repo

echo "=== [$(date)] a. flagship bench, ref-exact default, b64 ==="
timeout 3600 python bench.py --batch 64 | tee /tmp/bench_refexact_b64.json \
  || echo "B64 FAILED"

echo "=== [$(date)] b. flagship bench, ref-exact default, b128 ==="
timeout 3600 python bench.py --batch 128 || echo "B128 FAILED"

echo "=== [$(date)] c. HBM buffer ranking at the default step ==="
timeout 3600 python scripts/hlo_traffic.py --batch 64 --top 30 || echo "TRAFFIC FAILED"

echo "=== [$(date)] d. cost attribution with measured throughput ==="
IPS=$(python -c "import json,sys; print(json.load(open('/tmp/bench_refexact_b64.json'))['value'])" 2>/dev/null)
if [ -n "$IPS" ]; then
  timeout 3600 python scripts/step_profile.py --batch 64 --imgs-per-sec "$IPS" \
    || echo "PROFILE FAILED"
else
  echo "PROFILE SKIPPED: no bench value"
fi

echo "=== [$(date)] done ==="
