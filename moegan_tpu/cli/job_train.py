"""Containerized/managed training entrypoint — the sagemaker_train.py
analog.

Contract (reference moegan/sagemaker_train.py): hyperparameters arrive as
a JSON of strings at HYPERPARAMETERS_PATH (:83-102), data comes from
DATA_DIR (the S3-download analog, :104-124), training runs on a fraction
of the data (use_percentage, 33%% in the cloud runs :202), metrics stream
out as `[METRIC] name: value` stdout lines for the HPO regex (:206-228),
and the final model saves as aurora_model_final.* under MODEL_DIR
(:297-301). Launched by orchestration.jobs.JobRunner, which provides
HYPERPARAMETERS_PATH and JOB_DIR.
"""

from __future__ import annotations

import json
import os


def main(argv=None):
    hp_path = os.environ.get("HYPERPARAMETERS_PATH", "/opt/ml/input/config/hyperparameters.json")
    job_dir = os.environ.get("JOB_DIR", ".")
    model_dir = os.environ.get("MODEL_DIR", os.path.join(job_dir, "model"))
    data_dir = os.environ.get("DATA_DIR", "")

    raw = {}
    if os.path.exists(hp_path):
        with open(hp_path) as f:
            raw = json.load(f)

    from moegan_tpu.config import coerce_hyperparameters
    from moegan_tpu.cli.train_model import build_parser, config_from_args

    hp = coerce_hyperparameters(raw)
    # Map the hyperparameter dict onto the CLI surface so both entrypoints
    # share one config path.
    args = build_parser().parse_args([])
    for key, val in hp.items():
        name = {"learning_rate": "lr", "epochs": "epochs"}.get(key, key)
        if hasattr(args, name):
            setattr(args, name, val)
    cfg = config_from_args(args)

    from moegan_tpu.data.datasets import ProcessedMSCOCODataset, synthetic_dataset
    from moegan_tpu.train.loop import train_aurora_gan
    from moegan_tpu.utils.checkpoint import save_generator_params
    from moegan_tpu.utils.metrics import MetricLogger

    use_pct = float(hp.get("use_percentage", 1.0))
    if data_dir and os.path.exists(
        os.path.join(data_dir, "mscoco_train_images.npy")
    ):
        ds = ProcessedMSCOCODataset.load(data_dir, "train", use_percentage=use_pct)
        try:
            val = ProcessedMSCOCODataset.load(data_dir, "validation")
        except FileNotFoundError:
            val = None
    else:
        r = cfg.generator.max_resolution
        ds = synthetic_dataset(max(64, 2 * cfg.batch_size), r)
        val = synthetic_dataset(max(32, cfg.batch_size), r, seed=1)

    clip_params = None
    if not hp.get("no_clip_loss", False):
        from moegan_tpu.models.clip_jax import load_clip_params

        clip_params = load_clip_params()

    logger = MetricLogger(os.path.join(job_dir, "metrics.jsonl"))
    state = train_aurora_gan(
        ds, val, cfg=cfg, clip_params=clip_params,
        save_dir=os.path.join(job_dir, "checkpoints"), logger=logger,
    )
    os.makedirs(model_dir, exist_ok=True)
    final = os.path.join(model_dir, "aurora_model_final.msgpack")
    save_generator_params(final, state.g_params)
    with open(os.path.join(model_dir, "generator_config.json"), "w") as f:
        f.write(cfg.generator.to_json())
    print(f"saved {final}")


if __name__ == "__main__":
    main()
