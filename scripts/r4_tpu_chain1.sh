#!/bin/bash
# Round-4 TPU queue, part 1: the round-3 confirmation items (VERDICT.md #1),
# run as soon as the axon tunnel recovers.
#   0. wait for the tunnel (curl :8093/health every 30s; every 10 min also
#      try a bounded jax init in case the health port moved)
#   a. flagship bench b64 at final defaults (headline confirmation)
#   b. MOEGAN_FLASH_COMPACT_LSE=1 bench (128x-smaller lse residual A/B)
#   c. MOEGAN_MOE_BWD_VMEM_MB=10 bench (res-8 single-kernel MoE backward)
#   d. cost attribution at the final build
#   e. flagship bench b128 (batch scaling on the final build)
# Usage: nohup bash scripts/r4_tpu_chain1.sh > runs/r4_tpu_log1.txt 2>&1 &
set -x
cd /root/repo

probe_jax() {
  timeout 120 python - <<'EOF'
import jax
print("JAX_PROBE_OK", jax.devices())
EOF
}

echo "=== [$(date)] 0. waiting for tunnel ==="
up=0
for i in $(seq 1 1320); do
  code=$(curl -s -m 5 -o /dev/null -w "%{http_code}" http://127.0.0.1:8093/health || true)
  if [ "$code" != "000" ] && [ -n "$code" ]; then
    echo "tunnel up (HTTP $code) after ${i}x30s"
    up=1
    break
  fi
  if [ $((i % 20)) -eq 0 ]; then
    if probe_jax 2>/dev/null | grep -q JAX_PROBE_OK; then
      echo "tunnel up (jax probe) after ${i}x30s despite health=000"
      up=1
      break
    fi
  fi
  sleep 30
done
if [ "$up" != "1" ]; then
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
