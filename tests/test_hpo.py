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
