#!/bin/bash
# Round-3 TPU queue, part 6: measure the flash lse/delta plumbing fix,
# the 1x1-modconv matmul path, and the reference-exact heads change;
# then re-rank HBM buffers (now with source locations) and re-attribute
# per-module costs at the current defaults.
# Usage: nohup bash scripts/r3_tpu_chain6.sh > runs/r3_tpu_log6.txt 2>&1 &
set -x
cd /root/repo

echo "=== [$(date)] a. flagship bench b64 (flash residual fix + 1x1 matmul + 8-head parity) ==="
timeout 3600 python bench.py --batch 64 | tee /tmp/bench_r3c6_b64.json || echo "B64 FAILED"

echo "=== [$(date)] b. 16x16 reference-regime bench (heads now reference-exact 8) ==="
timeout 3600 python bench.py --resolution 16 --batch 64 || echo "R16 FAILED"

echo "=== [$(date)] c. HBM buffer ranking (with source locations) ==="
timeout 3600 python scripts/hlo_traffic.py --batch 64 --top 30 || echo "TRAFFIC FAILED"

echo "=== [$(date)] d. per-module attribution at current defaults ==="
timeout 3600 python scripts/block_bench.py --batch 64 || echo "BLOCK FAILED"

echo "=== [$(date)] e. cost attribution with measured throughput ==="
IPS=$(python -c "import json,sys; print(json.load(open('/tmp/bench_r3c6_b64.json'))['value'])" 2>/dev/null)
if [ -n "$IPS" ]; then
  timeout 3600 python scripts/step_profile.py --batch 64 --imgs-per-sec "$IPS" \
    || echo "PROFILE FAILED"
else
  echo "PROFILE SKIPPED: no bench value"
fi

echo "=== [$(date)] done ==="
