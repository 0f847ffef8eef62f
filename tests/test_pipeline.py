"""Offline data pipeline: preprocessing, augmentation, analysis, and the
full run_pipeline artifact contract."""

import json
import os

import numpy as np
import pytest

from moegan_tpu.data.augment import color_jitter, create_augmentations, hflip, random_affine
from moegan_tpu.data.pipeline import (
    analyze_dataset,
    load_coco_from_dir,
    resize_center_crop,
    run_pipeline,
)


def test_resize_center_crop():
    img = np.zeros((100, 200, 3), np.uint8)
    img[:, 100:, :] = 255  # right half white
    out = resize_center_crop(img, 64)
    assert out.shape == (64, 64, 3)
    assert out.min() >= -1 and out.max() <= 1
    # center crop of a 128x64 resize keeps the middle: left dark, right light
    assert out[:, :16].mean() < -0.9 and out[:, -16:].mean() > 0.9


def test_augmentations_shapes_and_ranges():
    rng = np.random.default_rng(0)
    img = np.clip(rng.normal(0, 0.5, (16, 16, 3)), -1, 1).astype(np.float32)
    assert np.array_equal(hflip(hflip(img)), img)
    for fn in (color_jitter, random_affine):
        out = fn(img, rng)
        assert out.shape == img.shape
        assert out.min() >= -1 and out.max() <= 1
        assert not np.array_equal(out, img)


def test_create_augmentations_duplicates_embeddings():
    rng = np.random.default_rng(0)
    imgs = np.clip(rng.normal(0, 0.5, (4, 16, 16, 3)), -1, 1).astype(np.float32)
    embs = rng.normal(size=(4, 8)).astype(np.float32)
    caps = np.asarray([f"c{i}" for i in range(4)], object)
    ai, ae, ac = create_augmentations(imgs, embs, caps, aug_factor=2, seed=0)
    assert ai.shape == (12, 16, 16, 3)
    np.testing.assert_array_equal(ae[:4], embs)
    np.testing.assert_array_equal(ae[4:8], embs)
    assert list(ac[8:]) == list(caps)


def test_analyze_dataset(tmp_path):
    caps = ["a cat on a mat", "a dog", "a cat sleeping on a sofa"]
    stats = analyze_dataset(caps, str(tmp_path))
    assert stats["num_samples"] == 3
    assert stats["avg_caption_length"] == pytest.approx((5 + 2 + 6) / 3)
    top = dict(stats["top_words"])
    assert top["a"] == 5 and top["cat"] == 2
    assert os.path.exists(tmp_path / "dataset_statistics.json")


def test_load_coco_from_dir(tmp_path):
    from PIL import Image

    (tmp_path / "imgs").mkdir()
    for i in range(3):
        Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(
            tmp_path / "imgs" / f"img{i}.jpg"
        )
    ann = {
        "images": [{"id": i, "file_name": f"img{i}.jpg"} for i in range(3)],
        "annotations": [
            {"image_id": 0, "caption": "first zero"},
            {"image_id": 0, "caption": "second zero"},
            {"image_id": 1, "caption": "one"},
            {"image_id": 2, "caption": "two"},
        ],
    }
    (tmp_path / "captions.json").write_text(json.dumps(ann))
    paths, caps = load_coco_from_dir(str(tmp_path / "imgs"), str(tmp_path / "captions.json"))
    assert len(paths) == 3
    assert caps[0] == "first zero"  # first caption per image
    paths2, _ = load_coco_from_dir(
        str(tmp_path / "imgs"), str(tmp_path / "captions.json"), max_samples=2
    )
    assert len(paths2) == 2


def test_run_pipeline_end_to_end(tmp_path):
    rng = np.random.default_rng(0)
    raw = [rng.integers(0, 255, (48, 72, 3), dtype=np.uint8) for _ in range(10)]
    caps = [f"synthetic caption number {i}" for i in range(10)]
    info = run_pipeline(
        raw, caps, str(tmp_path), augment=True, aug_factor=1, image_size=16,
    )
    assert info["n_train"] + info["n_val"] == 10
    assert info["n_val"] == 5  # min(max(1000, 2), 5)
    for f in (
        "mscoco_train_images.npy",
        "mscoco_train_text_embeddings.npy",
        "mscoco_validation_images.npy",
        "mscoco_train_augmented_images.npy",
        "dataset_statistics.json",
        "mscoco_train_metadata.pkl",
    ):
        assert os.path.exists(tmp_path / f), f
    aug = np.load(tmp_path / "mscoco_train_augmented_images.npy")
    assert aug.shape == (10, 3, 16, 16)  # 5 train x (1 + aug_factor)
