#!/bin/bash
# Round-4 TPU queue, part 5: runs when the axon tunnel recovers (it went
# down again after chain 4 finished, ~17:13 UTC).
#   0. wait for the tunnel health endpoint (up to 6 h; 404 = alive)
#   a. flagship bench b64 at the NEW combined defaults (compact lse ON +
#      MoE bwd VMEM 24 MB — each A/B'd individually in chains 3/4, this
#      confirms the combination the driver will bench for BENCH_r04)
#   b. serving transcript against the fresh demo ckpt (chain-4 item c
#      failed on the flagship-config assumption; fixed in 917ae22)
#   c. flagship bench b128 at the new defaults
# Usage: nohup bash scripts/r4_tpu_chain5.sh > runs/r4_tpu_log5.txt 2>&1 &
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

echo "=== [$(date)] a. flagship bench b64, combined new defaults ==="
timeout 5400 python bench.py --batch 64 || echo "A FAILED"

echo "=== [$(date)] b. serving transcript (fixed) ==="
timeout 1800 python scripts/serving_transcript.py --model-dir runs/demo || echo "B FAILED"

echo "=== [$(date)] c. flagship bench b128, combined new defaults ==="
timeout 5400 python bench.py --batch 128 || echo "C FAILED"

echo "=== [$(date)] done ==="
