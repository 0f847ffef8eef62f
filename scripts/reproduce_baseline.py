#!/usr/bin/env python
"""Reproduce the reference's pinned production run on real data (runbook).

The reference's deployment pipeline bakes the HPO-best hyperparameters and
publishes the 50-epoch validation metrics
(/root/reference/deployment-buildspec.yml:44-57,114-117):

    lr 6.716e-4 | batch 9 | beta(0.8821, 0.9386) | r1_gamma 9.666
    kl_w 6.753e-4 | kl_anneal 20 | clip_w16 0.19197 | clip_w8 0.04017
    balance_w 6.488e-3 | 50 epochs | 16x16 | 33% of the train split

    -> val d_loss 1.9575 | g_loss 0.8320 | clip_loss_16 0.8099
       | clip_loss_8 0.8128

This environment has no network egress, so the three external artifacts
must be dropped in; given them, this script runs the same regime and emits
the same metric set (model_metrics.json + [METRIC] stdout lines):

1. processed COCO at --data_dir (the byte-compatible npy contract of the
   reference pipeline: mscoco_{split}_images.npy / _text_embeddings.npy —
   produce with `python -m moegan_tpu.cli.process_data` wherever COCO is
   reachable, reference data_processing_pipeline.py:178-262);
2. CLIP_WEIGHTS_PATH -> converted ViT-B/32 (scripts/convert_clip.py;
   converter proven against real torch forwards in
   tests/test_torch_parity.py);
3. INCEPTION_WEIGHTS_PATH -> converted InceptionV3 (optional; only needed
   for the FID-10k eval step afterwards, scripts/eval_run.py).

Smoke-tested on the synthetic fixture via --synthetic (CI path,
tests/test_orchestration.py).

Usage:
  CLIP_WEIGHTS_PATH=clip_vitb32.npz python scripts/reproduce_baseline.py \
      --data_dir ./processed_data --out_dir runs/baseline_repro
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Pinned best hyperparameters (deployment-buildspec.yml:101-111, same
# values training-buildspec.yml:45-55).
BASELINE_HPARAMS = dict(
    lr=0.000671592452618617,
    batch_size=9,
    beta1=0.882075398724864,
    beta2=0.9385630453882949,
    r1_gamma=9.66634402753149,
    kl_weight=0.0006752514413805058,
    kl_annealing_epochs=20,
    clip_weight_16=0.19197351204230995,
    clip_weight_8=0.04016935445931133,
    balance_weight=0.006488147350209087,
    num_epochs=50,
    use_percentage=0.33,
)

# Published validation metrics of the pinned run (:114-117).
BASELINE_METRICS = {
    "d_loss": 1.9575,
    "g_loss": 0.8320,
    "clip_loss_16": 0.8099,
    "clip_loss_8": 0.8128,
}


def build_config(args):
    from moegan_tpu.config import (
        DiscriminatorConfig,
        GeneratorConfig,
        LossConfig,
        MeshConfig,
        TrainConfig,
    )

    hp = BASELINE_HPARAMS
    channels = {4: 512, 8: 256, 16: 128}
    router_hidden = 128
    epochs = args.epochs if args.epochs else hp["num_epochs"]
    batch = args.batch_size if args.batch_size else hp["batch_size"]
    if args.synthetic:
        channels = {4: 32, 8: 24, 16: 16}
        router_hidden = 8
    return TrainConfig(
        num_epochs=epochs,
        batch_size=batch,
        lr=hp["lr"],
        beta1=hp["beta1"],
        beta2=hp["beta2"],
        lr_warmup_epochs=3,
        seed=args.seed,
        log_interval=50,
        loss=LossConfig(
            r1_gamma=hp["r1_gamma"],
            kl_weight=hp["kl_weight"],
            kl_annealing_epochs=hp["kl_annealing_epochs"],
            balance_weight=hp["balance_weight"],
            clip_weights={16: hp["clip_weight_16"], 8: hp["clip_weight_8"]},
        ),
        generator=GeneratorConfig(
            max_resolution=16, channels=channels, router_hidden=router_hidden
        ),
        discriminator=DiscriminatorConfig(max_resolution=16),
        mesh=MeshConfig(expert_parallelism=args.expert_parallelism),
    )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default="./processed_data")
    ap.add_argument("--out_dir", default="runs/baseline_repro")
    ap.add_argument("--synthetic", action="store_true",
                    help="CI smoke path: tiny model on the synthetic fixture")
    ap.add_argument("--epochs", type=int, default=0, help="override (0 = pinned 50)")
    ap.add_argument("--batch_size", type=int, default=0, help="override (0 = pinned 9)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--expert_parallelism", type=int, default=0)
    ap.add_argument("--single_device", action="store_true",
                    help="skip the device mesh (one-device step). On a "
                    "1-core host the FULL 8-virtual-device CPU mesh's "
                    "collective rendezvous (hard 40 s timeout in XLA:CPU) "
                    "can abort under load; the CI smoke instead uses "
                    "--num_devices 2, which fits the rendezvous budget.")
    ap.add_argument("--num_devices", type=int, default=0,
                    help="cap the mesh at the first N devices (0 = all). "
                    "The CI smoke runs the sharded runbook on a 2-device "
                    "CPU mesh: small enough for a 1-core host's collective "
                    "rendezvous, still a real mesh (loop + prefetch + "
                    "checkpoint under GSPMD).")
    args = ap.parse_args(argv)

    import jax

    from moegan_tpu.data.datasets import ProcessedMSCOCODataset, synthetic_dataset
    from moegan_tpu.models.clip_jax import CLIP_WEIGHTS_ENV, load_clip_params
    from moegan_tpu.train.loop import train_aurora_gan
    from moegan_tpu.utils.checkpoint import save_generator_params
    from moegan_tpu.utils.metrics import MetricLogger

    cfg = build_config(args)
    os.makedirs(args.out_dir, exist_ok=True)

    semantic_clip = bool(os.environ.get(CLIP_WEIGHTS_ENV)) and os.path.exists(
        os.environ.get(CLIP_WEIGHTS_ENV, "")
    )
    if not semantic_clip:
        print(
            "WARNING: CLIP_WEIGHTS_PATH not set or missing - CLIP losses "
            "will use RANDOM-INIT towers (protocol-only, NOT comparable to "
            "the published clip_loss_16/clip_loss_8 values)."
        )
    clip_params = load_clip_params()

    if args.synthetic:
        ds = synthetic_dataset(max(64, 4 * cfg.batch_size), 16, seed=args.seed)
        val = synthetic_dataset(max(32, 2 * cfg.batch_size), 16, seed=args.seed + 1)
    else:
        # Reference regime: 33% of the augmented train split
        # (sagemaker_train.py:202), full validation split.
        ds = ProcessedMSCOCODataset.load(
            args.data_dir, "train",
            use_percentage=BASELINE_HPARAMS["use_percentage"],
        )
        val = ProcessedMSCOCODataset.load(args.data_dir, "validation")

    history: list[dict] = []

    def callback(epoch: int, metrics: dict) -> bool:
        history.append({"epoch": epoch, **metrics})
        return True

    logger = MetricLogger(os.path.join(args.out_dir, "metrics.jsonl"))
    state = train_aurora_gan(
        ds, val, cfg=cfg, clip_params=clip_params,
        metric_callback=callback, save_dir=os.path.join(args.out_dir, "ckpt"),
        logger=logger, distributed=not args.single_device,
        devices=(jax.devices()[: args.num_devices] if args.num_devices else None),
    )

    final = history[-1] if history else {}
    # deployment-buildspec.yml:95-120 metric-set contract.
    model_metrics = {
        "training_job": "tpu-baseline-repro",
        "semantic_clip": semantic_clip,
        "metrics": {
            "d_loss": final.get("val_d_loss"),
            "g_loss": final.get("val_g_loss"),
            "clip_loss_16": final.get("val_clip_loss_16"),
            "clip_loss_8": final.get("val_clip_loss_8"),
        },
        "reference_metrics": BASELINE_METRICS,
        "hyperparameters": {k: v for k, v in BASELINE_HPARAMS.items()},
        "epochs_run": len(history),
    }
    with open(os.path.join(args.out_dir, "model_metrics.json"), "w") as f:
        json.dump(model_metrics, f, indent=2)
    for name, value in model_metrics["metrics"].items():
        if value is not None:
            print(f"[METRIC] val_{name}: {value:.6f}")

    save_generator_params(
        os.path.join(args.out_dir, "aurora_model_final.msgpack"), state.g_params
    )
    print(f"wrote {args.out_dir}/model_metrics.json")
    return model_metrics


if __name__ == "__main__":
    main()
