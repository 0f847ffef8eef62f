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
            g_params, ds, clip_params={}, cfg=TINY_GEN, num_samples=16, batch_size=8,
            feature_source="clip",
        )
    finally:
        ev.clip_feature_extractor = orig

    assert res["num_samples"] == 16
    assert res["fid_feature_source"] == "clip"
    assert np.isfinite(res["fid"]) and res["fid"] > 0
    assert len(res["expert_utilization"]) == 4
    assert abs(sum(res["expert_utilization"]) - 1.0) < 1e-3


def test_evaluate_inception_source():
    """Default FID feature space = InceptionV3 pool-2048 (random-init in
    this env; the protocol + plumbing is what's under test)."""
    from moegan_tpu.models.inception_jax import init_inception_params

    ds = synthetic_dataset(8, 16, seed=1)
    g_params = tiny_generator_params()

    import moegan_tpu.infer.evaluate as ev

    def fake_clip_extractor(clip_params, batch_size=8):
        def extract(imgs):
            return np.asarray(imgs, np.float32).reshape(len(imgs), -1)[:, :512]
        return extract

    orig = ev.clip_feature_extractor
    ev.clip_feature_extractor = fake_clip_extractor
    try:
        res = evaluate_fid_clipscore(
            g_params, ds, clip_params={}, cfg=TINY_GEN, num_samples=8, batch_size=8,
            inception_params=init_inception_params(0),
        )
    finally:
        ev.clip_feature_extractor = orig

    assert res["fid_feature_source"] == "inception"
    assert np.isfinite(res["fid"]) and res["fid"] > 0
    assert res["clip_score"] is not None
