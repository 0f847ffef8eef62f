#!/bin/bash
# Round-5 TPU queue, part 9: settle MOEGAN_FLASH_NOMAX for real.
# Chain 5/7 left NOMAX at "+10 trend inside the ±12 single-sample noise
# band". bench.py now medians 3 timed reps (the chain-8 replication put
# same-arm repeat spread at ±0.3 at b128), so the band is tight enough
# to resolve a +10 effect. Part A: 3 interleaved pairs at --reps 5.
# Part B: the convergence evidence the PARITY §8 rule requires before
# any numerics-changing flag can become a default — 3 seeds x 20 epochs
# x {control, nomax} through scripts/flash_flags_ab.py, then aggregate.
# Promotion rule: default-on NOMAX iff (A) every pair shows nomax ahead
# and the mean edge exceeds the observed same-arm repeat spread, AND
# (B) aggregate says equivalent.
# Usage: nohup bash scripts/r5_tpu_chain9.sh > runs/r5_tpu_log10.txt 2>&1 &
set -x
cd /root/repo

for i in 1 2 3; do
  echo "=== [$(date)] A$i control (b64, reps 5) ==="
  timeout 5400 python bench.py --batch 64 --reps 5 || echo "A$i-ctl FAILED"
  echo "=== [$(date)] A$i nomax (b64, reps 5) ==="
  MOEGAN_FLASH_NOMAX=1 timeout 5400 python bench.py --batch 64 --reps 5 || echo "A$i-nomax FAILED"
done

for s in 0 1 2; do
  echo "=== [$(date)] B control seed $s ==="
  timeout 5400 python scripts/flash_flags_ab.py run control 20 $s || echo "B-ctl-$s FAILED"
  echo "=== [$(date)] B nomax seed $s ==="
  MOEGAN_FLASH_NOMAX=1 timeout 5400 python scripts/flash_flags_ab.py run nomax 20 $s || echo "B-nomax-$s FAILED"
done

echo "=== [$(date)] B aggregate ==="
python scripts/flash_flags_ab.py aggregate control nomax || echo "AGG FAILED"

echo "=== [$(date)] done ==="
