#!/bin/bash
# Round-3 TPU queue, part 10: runs when the axon tunnel recovers.
#   0. wait for the tunnel health endpoint (up to 6 h)
#   a. relayout probe (informs the flash-lse compaction)
#   b. cost attribution at the 992 build (fills the README "~40 GB" row)
#   c. flagship bench b128 (batch scaling on the final build)
#   d. MOEGAN_MOE_BWD_VMEM_MB=10 bench (res-8 single-kernel MoE backward trial)
#   e. fresh HBM ranking with source locations
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

echo "=== [$(date)] a. relayout probe ==="
timeout 1800 python scripts/probe_relayout.py || echo "PROBE FAILED"

echo "=== [$(date)] b. cost attribution at 992.06 ==="
timeout 3600 python scripts/step_profile.py --batch 64 --imgs-per-sec 992.06 \
  || echo "PROFILE FAILED"

echo "=== [$(date)] c. flagship bench b128 ==="
timeout 3600 python bench.py --batch 128 || echo "B128 FAILED"

echo "=== [$(date)] d. MoE bwd VMEM=10MB trial (res-8 single-kernel bwd) ==="
MOEGAN_MOE_BWD_VMEM_MB=10 timeout 3600 python bench.py --batch 64 || echo "VMEM10 FAILED"

echo "=== [$(date)] e. HBM ranking at final build ==="
timeout 3600 python scripts/hlo_traffic.py --batch 64 --top 25 || echo "TRAFFIC FAILED"

echo "=== [$(date)] done ==="
