"""HPO CLI — the hyperparameter_tuning.py + get_best_model.py analog.

Reads the reference's search-space JSON schema
(configs/hyperparameter_config.json), runs trials (in-process, each a
short train_aurora_gan with the metric-callback protocol), selects the
best on the objective (val_clip_loss, Minimize), writes
best_hyperparameters.json + model_metrics.json.
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    ap = argparse.ArgumentParser(description="Hyperparameter tuning")
    ap.add_argument("--config", type=str, required=True,
                    help="search-space JSON (reference schema)")
    ap.add_argument("--max_jobs", type=int, default=10)   # ref :81
    ap.add_argument("--warmup_jobs", type=int, default=4)
    ap.add_argument("--out_dir", type=str, default="./hpo_results")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--data_dir", type=str, default="")
    ap.add_argument("--max_resolution", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from moegan_tpu.cli.train_model import build_parser, config_from_args
    from moegan_tpu.config import coerce_hyperparameters
    from moegan_tpu.data.datasets import ProcessedMSCOCODataset, synthetic_dataset
    from moegan_tpu.hpo.search import SearchSpace, describe_best, run_hpo
    from moegan_tpu.orchestration.pipeline import publish_model_metrics
    from moegan_tpu.train.loop import train_aurora_gan

    space = SearchSpace.from_json_file(args.config)

    if args.synthetic or not args.data_dir:
        ds = synthetic_dataset(64, args.max_resolution, seed=args.seed)
        val = synthetic_dataset(32, args.max_resolution, seed=args.seed + 1)
    else:
        ds = ProcessedMSCOCODataset.load(args.data_dir, "train")
        val = ProcessedMSCOCODataset.load(args.data_dir, "validation")

    from moegan_tpu.models.clip_jax import load_clip_params

    clip_params = load_clip_params()

    def train_fn(params: dict, report) -> dict:
        hp = coerce_hyperparameters({k: str(v) for k, v in params.items()})
        cli = build_parser().parse_args([])
        cli.max_resolution = args.max_resolution
        for key, val_ in hp.items():
            name = {"learning_rate": "lr"}.get(key, key)
            if hasattr(cli, name):
                setattr(cli, name, val_)
        cfg = config_from_args(cli)
        final = {}

        def cb(epoch, metrics):
            final.clear()
            final.update(metrics)
            return report(epoch, metrics)

        train_aurora_gan(ds, val, cfg=cfg, clip_params=clip_params,
                         metric_callback=cb, distributed=True)
        return final

    best, trials = run_hpo(
        space, train_fn, max_jobs=args.max_jobs,
        warmup_jobs=args.warmup_jobs, seed=args.seed,
    )

    os.makedirs(args.out_dir, exist_ok=True)
    info = describe_best(best)
    with open(os.path.join(args.out_dir, "best_hyperparameters.json"), "w") as f:
        json.dump(info, f, indent=2)
    publish_model_metrics(
        {space.objective_name: best.objective},
        os.path.join(args.out_dir, "model_metrics.json"),
        training_job=info["BestTrainingJob"],
        hyperparameters=best.params,
    )
    print(json.dumps(info, indent=2))
    return info


if __name__ == "__main__":
    main()
