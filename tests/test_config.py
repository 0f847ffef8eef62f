"""Config system: JSON round-trips, hyperparameter coercion, resolution
ladders, head selection."""

import json

import pytest

from moegan_tpu.config import (
    DiscriminatorConfig,
    GeneratorConfig,
    LossConfig,
    TrainConfig,
    coerce_hyperparameters,
)


def test_train_config_json_roundtrip():
    cfg = TrainConfig(batch_size=16, lr=3e-4)
    blob = cfg.to_json()
    back = TrainConfig.from_dict(json.loads(blob))
    assert back.batch_size == 16 and back.lr == pytest.approx(3e-4)
    # nested dataclasses survive, int keys restored from JSON strings
    assert back.generator.channels[64] == 32
    assert back.loss.clip_weights[64] == pytest.approx(0.1)
    assert isinstance(back.loss, LossConfig)


def test_generator_resolutions_and_heads():
    g = GeneratorConfig(max_resolution=64)
    assert g.resolutions() == (4, 8, 16, 32, 64)
    assert GeneratorConfig(max_resolution=16).resolutions() == (4, 8, 16)
    # Reference-exact 8 heads at every width the reference's 16x16 regime
    # instantiates (dim >= 128, head_dim >= 16); our narrow 32/64-res
    # ladder-extension blocks halve heads until head_dim >= 32 (MXU
    # contraction fill — head count does not change param shapes).
    assert g.heads_for(512) == 8
    assert g.heads_for(256) == 8
    assert g.heads_for(128) == 8
    assert g.heads_for(64) == 2
    assert g.heads_for(32) == 1


def test_discriminator_channel_plans():
    assert DiscriminatorConfig(max_resolution=16).channel_plan() == (128, 256)
    assert DiscriminatorConfig(max_resolution=64).channel_plan() == (64, 128, 256, 256)
    assert DiscriminatorConfig(max_resolution=32).channel_plan() == (64, 128, 256)


def test_coerce_hyperparameters():
    hp = coerce_hyperparameters(
        {"learning_rate": "6.716e-4", "batch_size": "9", "kl_annealing_epochs": "20",
         "checkpoint_activation": "True", "note": "hello"}
    )
    assert hp["learning_rate"] == pytest.approx(6.716e-4)
    assert hp["batch_size"] == 9 and isinstance(hp["batch_size"], int)
    assert hp["checkpoint_activation"] is True
    assert hp["note"] == "hello"


def test_replace_is_functional():
    cfg = TrainConfig()
    cfg2 = cfg.replace(lr=1e-3)
    assert cfg.lr != cfg2.lr
