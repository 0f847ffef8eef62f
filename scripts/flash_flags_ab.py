#!/usr/bin/env python
"""Convergence A/B for numerics-changing flash-attention flags.

The round-5 softmax micro-opts fall in two classes: exact-in-real-math
rewrites (q pre-scale, exp2, fused_l, augsub, dv_bf16 — all bounded by
bf16 rounding the kernel already pays) and genuine numerics CHANGES
(MOEGAN_FLASH_NOMAX drops the online row-max shift; MOEGAN_FLASH_PBF16
quantizes the score tile itself to bf16). The repo's operating rule
(PARITY.md §8, set by the shared_fake episode) is that a numerics change
may only become a default with BOTH a hardware win AND convergence
evidence. This script produces the convergence evidence: the same
16x16 regime as scripts/shared_fake_ab.py (reference semantics,
shared_fake=False), one arm per flag set, compared on last-5-epoch val
losses across seeds.

Each arm runs in ITS OWN process invocation (the flags are read at trace
time), so usage is:

    python scripts/flash_flags_ab.py run control  [epochs] [seed]
    MOEGAN_FLASH_NOMAX=1 python scripts/flash_flags_ab.py run nomax [epochs] [seed]
    MOEGAN_FLASH_NOMAX=1 MOEGAN_FLASH_PBF16=1 \
        python scripts/flash_flags_ab.py run nomax_pbf16 [epochs] [seed]
    python scripts/flash_flags_ab.py aggregate control nomax

`run` writes runs/flash_flags_ab/<arm>_s<seed>/metrics.jsonl (+ the flag
env actually seen, for provenance). `aggregate` compares every seed of
arm B against arm A with the shared_fake decision rule: equivalent iff
the mean val_g_loss gap is below the control arm's own across-seed std.
"""

from __future__ import annotations

import glob
import json
import os
import sys

import numpy as np


def run_arm(arm: str, epochs: int, seed: int):
    from moegan_tpu.config import (
        DiscriminatorConfig,
        GeneratorConfig,
        LossConfig,
        TrainConfig,
    )
    from moegan_tpu.data.datasets import synthetic_dataset
    from moegan_tpu.infer.sample import Sampler
    from moegan_tpu.train.loop import train_aurora_gan
    from moegan_tpu.utils.metrics import MetricLogger

    # Same regime as scripts/shared_fake_ab.py's reference arm: 16x16
    # ladder at real widths so flash attention runs at T=256 (the flag
    # under test is in the training graph), reference-exact step.
    cfg = TrainConfig(
        generator=GeneratorConfig(
            max_resolution=16, channels={4: 512, 8: 256, 16: 128}
        ),
        discriminator=DiscriminatorConfig(max_resolution=16),
        loss=LossConfig(
            clip_weights={16: 0.1, 8: 0.05},
            balance_all_blocks=True,
            balance_kind="switch",
            balance_weight=0.04,
        ),
        num_epochs=epochs,
        batch_size=64,
        lr=6.716e-4,
        beta1=0.8821,
        beta2=0.9386,
        log_interval=8,
        seed=seed,  # identical data order + step rngs across arms
        shared_fake=False,
    )
    ds = synthetic_dataset(512, 16, seed=0)
    val = synthetic_dataset(128, 16, seed=1)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(repo, "runs", "flash_flags_ab", f"{arm}_s{seed}")
    os.makedirs(out_dir, exist_ok=True)
    history = []

    def cb(epoch, metrics):
        history.append({"epoch": epoch, **{k: float(v) for k, v in metrics.items()}})
        return True

    logger = MetricLogger(os.path.join(out_dir, "metrics.jsonl"))
    state = train_aurora_gan(ds, val, cfg=cfg, metric_callback=cb, logger=logger)

    sampler = Sampler(cfg.generator, state.g_params)
    emb = np.tile(np.asarray(ds.text_embeddings[:64]), (4, 1))
    _, stats = sampler(emb, num_samples=256, truncation_psi=0.7, return_stats=True)

    flags = {
        k: v for k, v in os.environ.items() if k.startswith("MOEGAN_FLASH_")
    }
    report = {
        "arm": arm,
        "seed": seed,
        "epochs": epochs,
        "flags": flags,
        "history": history,
        "expert_top1": {k: v["top1_fraction"] for k, v in stats.items()},
    }
    with open(os.path.join(out_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    last5 = [h["val_g_loss"] for h in history if "val_g_loss" in h][-5:]
    print(json.dumps({"arm": arm, "seed": seed,
                      "val_g_loss_last5_mean": float(np.mean(last5))}))


def aggregate(control: str, candidate: str):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = os.path.join(repo, "runs", "flash_flags_ab")

    def load(arm):
        out = {}
        for p in sorted(glob.glob(os.path.join(base, f"{arm}_s*", "report.json"))):
            with open(p) as f:
                rep = json.load(f)
            hist = rep["history"]
            g = [h["val_g_loss"] for h in hist if "val_g_loss" in h]
            d = [h["val_d_loss"] for h in hist if "val_d_loss" in h]
            out[rep["seed"]] = {
                "g": float(np.mean(g[-5:])),
                "d": float(np.mean(d[-5:])),
            }
        return out

    a, b = load(control), load(candidate)
    seeds = sorted(set(a) & set(b))
    if not seeds:
        raise SystemExit(f"no common seeds between {control} and {candidate}")
    ga = np.array([a[s]["g"] for s in seeds])
    gb = np.array([b[s]["g"] for s in seeds])
    gap = float(np.mean(gb - ga))
    noise = float(np.std(ga)) if len(seeds) > 1 else None
    equivalent = noise is not None and abs(gap) < noise
    summary = {
        "control": control,
        "candidate": candidate,
        "seeds": seeds,
        "per_seed": [
            {"seed": s, f"{control}_g": a[s]["g"], f"{candidate}_g": b[s]["g"],
             f"{control}_d": a[s]["d"], f"{candidate}_d": b[s]["d"]}
            for s in seeds
        ],
        "val_g_loss_mean_gap_candidate_minus_control": gap,
        "control_across_seed_std": noise,
        "equivalent": bool(equivalent),
        "rule": "equivalent iff |mean gap| < control arm's across-seed std "
                "(scripts/ab_aggregate.py's shared_fake decision rule)",
    }
    path = os.path.join(base, f"ab_summary_{candidate}.json")
    with open(path, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    if os.environ.get("MOEGAN_AB_CPU") == "1":
        # The axon TPU plugin ignores JAX_PLATFORMS; forcing CPU must
        # happen via jax.config before any computation (tests/conftest.py
        # does the same). Used for smoke-testing while the TPU is busy.
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax

    cache = os.path.join(repo, ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    mode = sys.argv[1] if len(sys.argv) > 1 else "run"
    if mode == "run":
        arm = sys.argv[2]
        epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 20
        seed = int(sys.argv[4]) if len(sys.argv) > 4 else 0
        run_arm(arm, epochs, seed)
    elif mode == "aggregate":
        aggregate(sys.argv[2], sys.argv[3])
    else:
        raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    main()
