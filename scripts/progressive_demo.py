#!/usr/bin/env python
"""Progressive 16->32->64 training demo on the synthetic fixture (TPU).

BASELINE.json config 4's regime at smoke scale: each stage trains a few
epochs, generator params transfer into the grown ladder, and the final
64x64 generator samples a grid. Produces runs/progressive/
{metrics.jsonl, samples_64.png, transfer_report.json}.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    import jax
    cache = os.path.join(repo, ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from moegan_tpu.cli.generate_images import save_grid
    from moegan_tpu.config import TrainConfig
    from moegan_tpu.data.datasets import synthetic_dataset
    from moegan_tpu.infer.sample import Sampler
    from moegan_tpu.train.progressive import train_progressive, transfer_params
    from moegan_tpu.utils.checkpoint import save_generator_params
    from moegan_tpu.utils.metrics import MetricLogger

    out_dir = os.path.join(repo, "runs", "progressive")
    os.makedirs(out_dir, exist_ok=True)

    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    cfg = TrainConfig(batch_size=32, lr=6.716e-4, beta1=0.8821, beta2=0.9386,
                      log_interval=8)
    ds = synthetic_dataset(256, 64, seed=0)
    val = synthetic_dataset(64, 64, seed=1)

    logger = MetricLogger(os.path.join(out_dir, "metrics.jsonl"))
    state, stage_states = train_progressive(
        ds, val, cfg=cfg,
        stages=((16, epochs), (32, epochs), (64, epochs)),
        logger=logger,
    )

    # Transfer accounting: how many params carried over per growth step.
    report = []
    for (r_prev, s_prev), (r_next, s_next) in zip(stage_states, stage_states[1:]):
        _, copied = transfer_params(s_prev.g_params, s_next.g_params)
        total = sum(1 for _ in jax.tree_util.tree_leaves(s_next.g_params))
        report.append({"from": r_prev, "to": r_next,
                       "leaves_transferable": copied, "leaves_total": total})
    with open(os.path.join(out_dir, "transfer_report.json"), "w") as f:
        json.dump(report, f, indent=2)

    from moegan_tpu.train.progressive import stage_config
    scfg = stage_config(cfg, 64, epochs)
    save_generator_params(os.path.join(out_dir, "aurora_model_64.msgpack"), state.g_params)
    sampler = Sampler(scfg.generator, state.g_params)
    images = sampler(ds.text_embeddings[:16], num_samples=16, truncation_psi=0.7)
    save_grid(np.asarray(images), os.path.join(out_dir, "samples_64.png"))
    print(f"progressive artifacts in {out_dir}")


if __name__ == "__main__":
    main()
