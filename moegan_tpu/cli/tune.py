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
    ap.add_argument("--max_parallel_jobs", type=int, default=2)  # ref :82
    ap.add_argument("--warmup_jobs", type=int, default=4)
    ap.add_argument("--strategy", type=str, default="tpe", choices=("tpe", "perturb"))
    ap.add_argument("--trial_mode", type=str, default="in-process",
                    choices=("in-process", "subprocess"),
                    help="subprocess runs each trial via the JobRunner "
                         "(MaxParallelTrainingJobs semantics, isolated "
                         "processes); in-process threads trials through "
                         "one JAX runtime")
    ap.add_argument("--out_dir", type=str, default="./hpo_results")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--data_dir", type=str, default="")
    ap.add_argument("--max_resolution", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from moegan_tpu.cli.train_model import build_parser, config_from_args
    from moegan_tpu.config import coerce_hyperparameters
    from moegan_tpu.data.datasets import ProcessedMSCOCODataset, synthetic_dataset
    from moegan_tpu.hpo.search import (
        SearchSpace,
        describe_best,
        run_hpo,
        trial_timeline,
    )
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

    def train_in_process(params: dict, report) -> dict:
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

    def make_subprocess_train_fn():
        """Each trial = one JobRunner subprocess (isolated process per
        trial, the SageMaker training-job analog); the [METRIC] stdout of
        the job feeds the early-stop reporter, and a False return stops
        the job (StopTrainingJob semantics)."""
        import time as _time

        from moegan_tpu.orchestration.jobs import JobRunner, python_job

        runner = JobRunner(os.path.join(args.out_dir, "jobs"))

        def train_fn(params: dict, report) -> dict:
            hp = {k: str(v) for k, v in params.items()}
            hp.setdefault("max_resolution", str(args.max_resolution))
            env = {"MPLBACKEND": "Agg"}
            if args.data_dir and not args.synthetic:
                env["DATA_DIR"] = args.data_dir
            rec = runner.submit(
                python_job("hpo-trial", "moegan_tpu.cli.job_train",
                           hyperparameters=hp, environment=env)
            )
            seen = 0
            while runner.poll(rec.job_name).status == "InProgress":
                vals = runner.metrics(rec.job_name, space.objective_name)
                for epoch, v in enumerate(vals[seen:], start=seen):
                    if not report(epoch, {space.objective_name: v}):
                        runner.stop(rec.job_name)
                        break
                seen = len(vals)
                _time.sleep(0.5)
            vals = runner.metrics(rec.job_name, space.objective_name)
            return {space.objective_name: vals[-1]} if vals else {}

        return train_fn

    os.makedirs(args.out_dir, exist_ok=True)
    train_fn = (
        make_subprocess_train_fn() if args.trial_mode == "subprocess"
        else train_in_process
    )
    best, trials = run_hpo(
        space, train_fn, max_jobs=args.max_jobs,
        max_parallel_jobs=args.max_parallel_jobs,
        warmup_jobs=args.warmup_jobs, seed=args.seed,
        strategy=args.strategy,
    )

    info = describe_best(best)
    with open(os.path.join(args.out_dir, "best_hyperparameters.json"), "w") as f:
        json.dump(info, f, indent=2)
    with open(os.path.join(args.out_dir, "trial_timeline.json"), "w") as f:
        json.dump(trial_timeline(trials), f, indent=2)
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
