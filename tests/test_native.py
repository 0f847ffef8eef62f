"""Native C++ batcher: parity with numpy and availability in this image."""

import numpy as np
import pytest

from moegan_tpu.data import native


def test_library_builds():
    assert native.available(), "g++ toolchain should build the batcher here"


def test_gather_rows_parity():
    rng = np.random.default_rng(0)
    src = rng.normal(size=(50, 7, 5)).astype(np.float32)
    idx = rng.integers(0, 50, size=16)
    np.testing.assert_array_equal(native.gather_rows(src, idx), src[idx])


def test_gather_images_flip_parity():
    rng = np.random.default_rng(1)
    src = rng.normal(size=(20, 8, 6, 3)).astype(np.float32)
    idx = rng.integers(0, 20, size=10)
    flip = (rng.random(10) < 0.5).astype(np.uint8)
    got = native.gather_images(src, idx, flip)
    want = src[idx].copy()
    want[flip.astype(bool)] = want[flip.astype(bool)][:, :, ::-1]
    np.testing.assert_array_equal(got, want)


def test_gather_normalize_parity():
    rng = np.random.default_rng(2)
    src = np.clip(rng.normal(size=(12, 4, 4, 3)), -1, 1).astype(np.float32)
    idx = np.arange(12)[::-1]
    mean = np.asarray([0.48, 0.45, 0.4], np.float32)
    std = np.asarray([0.26, 0.26, 0.27], np.float32)
    got = native.gather_normalize(src, idx, mean, std)
    want = (((src[idx] + 1) * 0.5) - mean) / std
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_loader_uses_native_path():
    from moegan_tpu.data.datasets import synthetic_dataset
    from moegan_tpu.data.loader import BatchLoader

    ds = synthetic_dataset(16, 16)
    loader = BatchLoader(ds, 8, shuffle=True, seed=0)
    batches = list(loader.epoch(0))
    assert len(batches) == 2
    assert batches[0]["image"].dtype == np.float32
