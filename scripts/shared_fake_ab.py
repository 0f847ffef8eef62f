#!/usr/bin/env python
"""Convergence A/B: shared_fake=True vs False (same seeds, same data).

shared_fake=True runs ONE generator forward per step and feeds D the
stop-gradient of the same fake G updates on (the standard DCGAN-tutorial
pattern, +26% step throughput); the reference regenerates the fake per
phase with an independent Bayesian router weight sample
(/root/reference/moegan/t2i_moe_gan.py:1292,1358), reproduced by
shared_fake=False. Round-2 flipped the default to True for perf without a
convergence A/B; this script produces that evidence
(VERDICT round 2, weak #5 / next-step #6).

Writes runs/shared_fake_ab/{shared,ref}/metrics.jsonl + samples.png and an
overlay report ab_report.json with per-epoch val losses and final expert
utilization for both arms.

Usage: python scripts/shared_fake_ab.py [epochs=20] [seed=0]
Seeds >0 write runs/shared_fake_ab/{shared,ref}_s{seed}/ and
ab_report_s{seed}.json so the A/B can be repeated for seed robustness.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np


def run_arm(out_dir: str, shared: bool, epochs: int, seed: int = 0):
    from moegan_tpu.cli.generate_images import save_grid
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
        seed=seed,  # identical data order + step rngs in both arms
        shared_fake=shared,
    )
    ds = synthetic_dataset(512, 16, seed=0)
    val = synthetic_dataset(128, 16, seed=1)

    os.makedirs(out_dir, exist_ok=True)
    history = []

    def cb(epoch, metrics):
        history.append({"epoch": epoch, **{k: float(v) for k, v in metrics.items()}})
        return True

    logger = MetricLogger(os.path.join(out_dir, "metrics.jsonl"))
    state = train_aurora_gan(
        ds, val, cfg=cfg, metric_callback=cb, logger=logger
    )

    sampler = Sampler(cfg.generator, state.g_params)
    emb = np.tile(np.asarray(ds.text_embeddings[:64]), (4, 1))
    images, stats = sampler(emb, num_samples=256, truncation_psi=0.7, return_stats=True)
    save_grid(np.asarray(images[:16]), os.path.join(out_dir, "samples.png"))
    return history, {k: v["top1_fraction"] for k, v in stats.items()}


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    import jax

    cache = os.path.join(repo, ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    base = os.path.join(repo, "runs", "shared_fake_ab")
    sfx = "" if seed == 0 else f"_s{seed}"

    hist_s, util_s = run_arm(os.path.join(base, "shared" + sfx), True, epochs, seed)
    hist_r, util_r = run_arm(os.path.join(base, "ref" + sfx), False, epochs, seed)

    def final_gap(a, b, key):
        va = [h[key] for h in a if key in h]
        vb = [h[key] for h in b if key in h]
        return {
            "shared_final": va[-1] if va else None,
            "ref_final": vb[-1] if vb else None,
            "mean_abs_gap_last5": float(
                np.mean(np.abs(np.array(va[-5:]) - np.array(vb[-5:])))
            ) if len(va) >= 5 and len(vb) >= 5 else None,
        }

    report = {
        "seed": seed,
        "epochs": epochs,
        "arms": {"shared": "shared_fake=True (1 G fwd/step)",
                 "ref": "shared_fake=False (reference: fresh fake per phase)"},
        "val_d_loss": final_gap(hist_s, hist_r, "val_d_loss"),
        "val_g_loss": final_gap(hist_s, hist_r, "val_g_loss"),
        "expert_top1_shared": util_s,
        "expert_top1_ref": util_r,
        "history_shared": hist_s,
        "history_ref": hist_r,
    }
    with open(os.path.join(base, f"ab_report{sfx}.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: report[k] for k in ("val_d_loss", "val_g_loss")}, indent=2))
    print(f"A/B artifacts in {base}")


if __name__ == "__main__":
    main()
