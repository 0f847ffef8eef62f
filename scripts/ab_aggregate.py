#!/usr/bin/env python
"""Aggregate the shared_fake convergence A/B across seeds and recommend a
default.

Reads every runs/shared_fake_ab/ab_report*.json (one per seed, produced
by scripts/shared_fake_ab.py) and compares the two arms on the mean of
the last-5-epoch val losses — the same smoothing window the per-seed
reports use, chosen because single-epoch GAN val_g_loss swings by more
than the arm gap (seed-0 ref arm alone spans 1.79-6.34 over its last 8
epochs).

Decision rule: the arms are "equivalent" iff the across-seed mean gap on
val_g_loss is smaller than the across-seed std of the reference arm's own
metric (i.e. the A/B effect is indistinguishable from seed noise). If not
equivalent, the reference semantics (shared_fake=False, fresh fake per
phase — /root/reference/moegan/t2i_moe_gan.py:1292,1358) must be the
default regardless of its throughput cost.

Usage: python scripts/ab_aggregate.py
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np


def last5_mean(history, key):
    vals = [h[key] for h in history if key in h]
    return float(np.mean(vals[-5:])) if len(vals) >= 5 else None


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = os.path.join(repo, "runs", "shared_fake_ab")
    reports = sorted(glob.glob(os.path.join(base, "ab_report*.json")))
    if not reports:
        raise SystemExit(f"no ab_report*.json under {base}")

    rows = []
    for path in reports:
        with open(path) as f:
            rep = json.load(f)
        rows.append(
            {
                "seed": rep.get("seed", 0),
                "shared_g": last5_mean(rep["history_shared"], "val_g_loss"),
                "ref_g": last5_mean(rep["history_ref"], "val_g_loss"),
                "shared_d": last5_mean(rep["history_shared"], "val_d_loss"),
                "ref_d": last5_mean(rep["history_ref"], "val_d_loss"),
            }
        )

    sg = np.array([r["shared_g"] for r in rows])
    rg = np.array([r["ref_g"] for r in rows])
    sd = np.array([r["shared_d"] for r in rows])
    rd = np.array([r["ref_d"] for r in rows])

    gap_g = float(np.mean(sg - rg))
    ref_noise = float(np.std(rg, ddof=1)) if len(rg) > 1 else float("nan")
    equivalent = len(rg) > 1 and abs(gap_g) < ref_noise

    summary = {
        "n_seeds": len(rows),
        "per_seed": rows,
        "val_g_loss_last5": {
            "shared_mean": float(np.mean(sg)),
            "ref_mean": float(np.mean(rg)),
            "mean_gap_shared_minus_ref": gap_g,
            "ref_across_seed_std": ref_noise,
        },
        "val_d_loss_last5": {
            "shared_mean": float(np.mean(sd)),
            "ref_mean": float(np.mean(rd)),
            "mean_gap_shared_minus_ref": float(np.mean(sd - rd)),
        },
        "equivalent_within_seed_noise": bool(equivalent),
        "recommended_default_shared_fake": bool(equivalent),
    }
    out = os.path.join(base, "ab_summary.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))
    print(f"summary written to {out}")


if __name__ == "__main__":
    main()
