#!/bin/bash
# Round-3 TPU queue, part 10: runs when the axon tunnel recovers.
#   0. wait for the tunnel health endpoint (up to 6 h)
#   a. flagship bench b64 at final defaults (headline confirmation)
#   b. MOEGAN_FLASH_COMPACT_LSE=1 bench (128x-smaller lse residual A/B)
#   c. MOEGAN_MOE_BWD_VMEM_MB=10 bench (res-8 single-kernel MoE backward)
#   d. cost attribution at the final build
#   e. flagship bench b128 (batch scaling on the final build)
# Usage: nohup bash scripts/r3_tpu_chain10.sh > runs/r3_tpu_log10.txt 2>&1 &
set -x
cd /root/repo

echo "=== [$(date)] 0. waiting for tunnel ==="
for i in $(seq 1 720); do
  code=$(curl -s -m 5 -o /dev/null -w "%{http_code}" http://127.0.0.1:8093/health || true)
  if [ "$code" != "000" ] && [ -n "$code" ]; then
    echo "tunnel up (HTTP $code) after ${i}x30s"
    break
  fi
  sleep 30
done
code=$(curl -s -m 5 -o /dev/null -w "%{http_code}" http://127.0.0.1:8093/health || true)
if [ "$code" = "000" ] || [ -z "$code" ]; then
  echo "TUNNEL NEVER CAME BACK - aborting chain"
  exit 1
fi
sleep 60  # let the tunnel finish initializing

echo "=== [$(date)] a. flagship bench b64, final defaults ==="
timeout 3600 python bench.py --batch 64 | tee /tmp/bench_final_b64.json || echo "A FAILED"

echo "=== [$(date)] b. MOEGAN_FLASH_COMPACT_LSE=1 ==="
MOEGAN_FLASH_COMPACT_LSE=1 timeout 3600 python bench.py --batch 64 || echo "B FAILED"

echo "=== [$(date)] c. MOEGAN_MOE_BWD_VMEM_MB=10 ==="
MOEGAN_MOE_BWD_VMEM_MB=10 timeout 3600 python bench.py --batch 64 || echo "C FAILED"

echo "=== [$(date)] d. cost attribution at the final build ==="
IPS=$(python -c "import json; print(json.load(open('/tmp/bench_final_b64.json'))['value'])" 2>/dev/null)
timeout 3600 python scripts/step_profile.py --batch 64 --imgs-per-sec "${IPS:-992.06}" \
  || echo "PROFILE FAILED"

echo "=== [$(date)] e. flagship bench b128 ==="
timeout 3600 python bench.py --batch 128 || echo "B128 FAILED"

echo "=== [$(date)] done ==="
