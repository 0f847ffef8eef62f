"""On-device FID/CLIPScore evaluation loop."""

import numpy as np
import pytest

from moegan_tpu.data.datasets import synthetic_dataset
from moegan_tpu.infer.evaluate import evaluate_fid_clipscore
from tests.helpers import TINY_GEN, tiny_generator_params


def test_evaluate_fid_clipscore():
    ds = synthetic_dataset(16, 16, seed=0)
    g_params = tiny_generator_params()

    # small fake extractor via a stub clip: use the real pathway but it's
    # heavy; instead monkeypatch the feature extractor through a tiny
    # clip_params is the real deal — use a cheap stand-in by patching.
    import moegan_tpu.infer.evaluate as ev

    def fake_extractor(clip_params, batch_size=8):
        def extract(imgs):
            x = np.asarray(imgs, np.float32).reshape(len(imgs), -1)
            return x[:, :32]
        return extract

    orig = ev.clip_feature_extractor
    ev.clip_feature_extractor = fake_extractor
    try:
        res = evaluate_fid_clipscore(
            g_params, ds, clip_params={}, cfg=TINY_GEN, num_samples=16, batch_size=8
        )
    finally:
        ev.clip_feature_extractor = orig

    assert res["num_samples"] == 16
    assert np.isfinite(res["fid"]) and res["fid"] > 0
    assert len(res["expert_utilization"]) == 4
    assert abs(sum(res["expert_utilization"]) - 1.0) < 1e-3
