"""HPO harness: reference search-space JSON schema, [METRIC] protocol,
trial selection, early stop."""

import json

import numpy as np
import pytest

from moegan_tpu.hpo.search import SearchSpace, describe_best, parse_metric_lines, run_hpo

REF_SCHEMA = {
    "hyperparameter_ranges": {
        "learning_rate": {"min_value": 1e-4, "max_value": 5e-4, "scaling_type": "Logarithmic"},
        "r1_gamma": {"min_value": 5.0, "max_value": 15.0, "scaling_type": "Linear"},
    },
    "integer_parameter_ranges": {
        "kl_annealing_epochs": {"min_value": 2, "max_value": 4, "scaling_type": "Auto"}
    },
    "static_hyperparameters": {"epochs": "6", "batch_size": "8"},
    "objective_metric": {"name": "val_clip_loss", "type": "Minimize"},
}


def test_space_parsing_and_sampling():
    space = SearchSpace.from_config(REF_SCHEMA)
    rng = np.random.default_rng(0)
    for _ in range(20):
        p = space.sample(rng)
        assert 1e-4 <= p["learning_rate"] <= 5e-4
        assert 5.0 <= p["r1_gamma"] <= 15.0
        assert p["kl_annealing_epochs"] in (2, 3, 4)
        assert p["epochs"] == "6"


def test_missing_integer_section_is_ok():
    """The reference KeyErrors without integer_parameter_ranges
    (hyperparameter_tuning.py:199); every section is optional here."""
    cfg = {k: v for k, v in REF_SCHEMA.items() if k != "integer_parameter_ranges"}
    space = SearchSpace.from_config(cfg)
    p = space.sample(np.random.default_rng(0))
    assert "kl_annealing_epochs" not in p


def test_parse_metric_lines():
    stdout = """
some log line
[METRIC] val_clip_loss: 0.8123
[METRIC] val_d_loss: 1.900000
[METRIC] val_clip_loss: 0.790000
"""
    assert parse_metric_lines(stdout, "val_clip_loss") == [0.8123, 0.79]
    assert parse_metric_lines(stdout, "val_g_loss") == []


def test_run_hpo_finds_optimum():
    space = SearchSpace.from_config(REF_SCHEMA)

    def train_fn(params, report):
        # objective minimized at learning_rate = 3e-4, r1_gamma = 10
        obj = (np.log10(params["learning_rate"]) - np.log10(3e-4)) ** 2 + (
            (params["r1_gamma"] - 10.0) / 10.0
        ) ** 2
        for epoch in range(3):
            if not report(epoch, {"val_clip_loss": obj + 0.1 * (2 - epoch)}):
                break
        return {"val_clip_loss": obj}

    best, trials = run_hpo(space, train_fn, max_jobs=12, warmup_jobs=4, seed=0)
    assert len(trials) == 12
    assert best.objective == min(t.objective for t in trials)
    assert best.objective < 0.3  # converges near the optimum
    info = describe_best(best)
    assert info["BestTrainingJob"] == f"trial-{best.trial_id}"


def test_from_json_file(tmp_path):
    p = tmp_path / "space.json"
    p.write_text(json.dumps(REF_SCHEMA))
    space = SearchSpace.from_json_file(str(p))
    assert space.objective_name == "val_clip_loss" and space.objective_minimize


def test_tpe_beats_random_on_average():
    """The TPE surrogate should concentrate samples near the optimum:
    best-of-10 with TPE <= best-of-10 random on the same quadratic."""
    space = SearchSpace.from_config(REF_SCHEMA)

    def objective(params):
        return (np.log10(params["learning_rate"]) - np.log10(3e-4)) ** 2 + (
            (params["r1_gamma"] - 10.0) / 10.0
        ) ** 2

    def train_fn(params, report):
        return {"val_clip_loss": objective(params)}

    tpe_best, _ = run_hpo(space, train_fn, max_jobs=14, warmup_jobs=4,
                          seed=3, strategy="tpe", early_stopping=False)
    rng = np.random.default_rng(3)
    random_best = min(objective(space.sample(rng)) for _ in range(14))
    assert tpe_best.objective <= random_best + 0.05


def test_parallel_trials_overlap():
    """max_parallel_jobs=2 must actually overlap trial execution
    (reference MaxParallelTrainingJobs=2, hyperparameter_tuning.py:82)."""
    import time

    from moegan_tpu.hpo.search import trial_timeline

    space = SearchSpace.from_config(REF_SCHEMA)

    def train_fn(params, report):
        time.sleep(0.15)
        return {"val_clip_loss": params["r1_gamma"]}

    t0 = time.time()
    best, trials = run_hpo(space, train_fn, max_jobs=6, warmup_jobs=6,
                           max_parallel_jobs=2, seed=0)
    elapsed = time.time() - t0
    assert elapsed < 6 * 0.15  # strictly faster than sequential
    tl = trial_timeline(trials)
    overlaps = sum(
        1
        for a in tl
        for b in tl
        if a["trial_id"] < b["trial_id"]
        and a["started_at"] < b["ended_at"]
        and b["started_at"] < a["ended_at"]
    )
    assert overlaps >= 1
    assert best.objective == min(t["objective"] for t in tl)


def test_early_stop_sign_safe():
    """The trailing rule must early-stop bad trials for objectives of
    either sign (the old best*1.5 rule inverted for negatives)."""
    for offset in (0.0, -5.0):  # positive- and negative-valued objectives
        space = SearchSpace.from_config(REF_SCHEMA)
        epochs_run = {}

        def train_fn(params, report, _offset=offset, _n=epochs_run):
            idx = len(_n)
            good = idx == 0
            val = (_offset + (0.1 if good else 3.0))
            ran = 0
            for epoch in range(8):
                ran += 1
                if not report(epoch, {"val_clip_loss": val}):
                    break
            _n[idx] = ran
            return {"val_clip_loss": val}

        best, trials = run_hpo(space, train_fn, max_jobs=3, warmup_jobs=3,
                               max_parallel_jobs=1, seed=0, patience=2)
        # trial 0 sets the incumbent; later flat, trailing trials stop early
        assert epochs_run[0] == 8
        assert epochs_run[1] < 8 and epochs_run[2] < 8
        assert abs(best.objective - (offset + 0.1)) < 1e-9
