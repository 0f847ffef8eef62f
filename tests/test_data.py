"""Data layer: npy artifact contract round-trip (reference
data_processing_pipeline.py:178-262 file naming + CHW layout), loader
semantics, prefetch."""

import numpy as np
import pytest

from moegan_tpu.data.datasets import ProcessedMSCOCODataset, synthetic_dataset
from moegan_tpu.data.loader import BatchLoader, prefetch_to_device


def test_synthetic_dataset_properties():
    ds = synthetic_dataset(16, 16, seed=0)
    assert len(ds) == 16
    img, emb, cap = ds[0]
    assert img.shape == (16, 16, 3) and img.min() >= -1 and img.max() <= 1
    assert emb.shape == (512,)
    # deterministic given seed
    ds2 = synthetic_dataset(16, 16, seed=0)
    np.testing.assert_array_equal(ds.images, ds2.images)


def test_npy_contract_roundtrip(tmp_path):
    ds = synthetic_dataset(8, 16)
    ds.save(str(tmp_path), "train")
    # on-disk layout must be the reference's CHW contract
    raw = np.load(tmp_path / "mscoco_train_images.npy")
    assert raw.shape == (8, 3, 16, 16)
    loaded = ProcessedMSCOCODataset.load(str(tmp_path), "train", return_captions=True)
    assert loaded.images.shape == (8, 16, 16, 3)
    np.testing.assert_allclose(loaded.images, ds.images, rtol=1e-6)
    np.testing.assert_array_equal(loaded.text_embeddings, ds.text_embeddings)
    assert loaded.captions is not None


def test_use_percentage_subsets(tmp_path):
    ds = synthetic_dataset(20, 16)
    ds.save(str(tmp_path), "train")
    sub = ProcessedMSCOCODataset.load(str(tmp_path), "train", use_percentage=0.33)
    assert len(sub) == 6  # int(20 * 0.33) — SimpleDataset parity


def test_batch_loader_shuffles_and_drops_last():
    ds = synthetic_dataset(10, 16)
    loader = BatchLoader(ds, 4, shuffle=True, drop_last=True, seed=0)
    assert loader.steps_per_epoch == 2
    b1 = list(loader.epoch(0))
    b2 = list(loader.epoch(1))
    assert len(b1) == 2
    assert b1[0]["image"].shape == (4, 16, 16, 3)
    assert b1[0]["text"].shape == (4, 512)
    # different epochs -> different order
    assert not np.array_equal(b1[0]["image"], b2[0]["image"])
    # same epoch replays identically (resume determinism)
    b1r = list(loader.epoch(0))
    np.testing.assert_array_equal(b1[0]["image"], b1r[0]["image"])


def test_prefetch_preserves_order_and_count():
    ds = synthetic_dataset(12, 16)
    loader = BatchLoader(ds, 4, shuffle=False)
    direct = list(loader.epoch(0))
    fetched = list(prefetch_to_device(loader.epoch(0), size=2))
    assert len(fetched) == len(direct) == 3
    for a, b in zip(direct, fetched):
        np.testing.assert_allclose(a["image"], np.asarray(b["image"]))
