"""train_aurora_gan loop: end-to-end training, validation metrics,
metric-callback early stop, checkpoint/resume."""

import jax
import numpy as np
import pytest

from moegan_tpu.config import MeshConfig, TrainConfig
from moegan_tpu.data.datasets import synthetic_dataset
from moegan_tpu.train.loop import train_aurora_gan
from moegan_tpu.utils.metrics import EMAMeter, MetricLogger
from tests.helpers import TINY_DISC, TINY_GEN

CFG = TrainConfig(
    generator=TINY_GEN, discriminator=TINY_DISC,
    mesh=MeshConfig(expert_parallelism=4),
    num_epochs=2, batch_size=8, log_interval=2,
)


@pytest.fixture(scope="module")
def data():
    return synthetic_dataset(24, 16), synthetic_dataset(16, 16, seed=1)


def test_loop_trains_validates_and_checkpoints(tmp_path_factory, data):
    ds, val = data
    d = str(tmp_path_factory.mktemp("ckpt"))
    calls = []
    state = train_aurora_gan(
        ds, val, cfg=CFG, save_dir=d,
        metric_callback=lambda e, m: calls.append((e, dict(m))) or True,
    )
    assert int(state.step) == 2 * (24 // 8)
    assert [c[0] for c in calls] == [0, 1]
    assert set(calls[-1][1]) >= {"val_d_loss", "val_g_loss"}
    assert all(np.isfinite(v) for v in calls[-1][1].values())

    # resume continues from the saved epoch
    state2 = train_aurora_gan(
        ds, val, cfg=CFG.replace(num_epochs=3), save_dir=d, resume=True,
    )
    assert int(state2.step) == 3 * (24 // 8)


def test_small_val_split_falls_back_instead_of_skipping(data, capsys):
    """A val split smaller than batch_size must still produce val metrics
    (round-2 behavior silently skipped validation, stranding the HPO
    objective)."""
    ds, _ = data
    small_val = synthetic_dataset(6, 16, seed=2)  # < batch_size=8
    calls = []
    train_aurora_gan(
        ds, small_val, cfg=CFG.replace(num_epochs=1),
        metric_callback=lambda e, m: calls.append(dict(m)) or True,
    )
    assert calls and {"val_d_loss", "val_g_loss"} <= set(calls[0])
    assert all(np.isfinite(v) for v in calls[0].values())
    cap = capsys.readouterr()
    streams = cap.out + cap.err
    assert "smaller than" in streams and "batch_size=6" in streams


def test_loop_early_stop(data):
    ds, val = data
    state = train_aurora_gan(
        ds, val, cfg=CFG.replace(num_epochs=5),
        metric_callback=lambda e, m: e < 1,  # stop after epoch 2's callback
    )
    assert int(state.step) == 2 * (24 // 8)


def test_ema_meter():
    m = EMAMeter(0.9)
    m.update({"x": 1.0})
    m.update({"x": 0.0})
    assert m["x"] == pytest.approx(0.9)


def test_metric_logger_protocol(capsys, tmp_path):
    log = MetricLogger(str(tmp_path / "m.jsonl"))
    log.log_metric("val_clip_loss", 0.8123)
    out = capsys.readouterr().out
    assert "[METRIC] val_clip_loss: 0.812300" in out
    from moegan_tpu.hpo.search import parse_metric_lines

    assert parse_metric_lines(out, "val_clip_loss") == [0.8123]
    log.close()
    assert (tmp_path / "m.jsonl").read_text().strip()
