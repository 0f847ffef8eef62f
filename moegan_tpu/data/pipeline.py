"""Offline data-processing pipeline: images + captions -> training npy.

Rebuild of data_processing/data_processing_pipeline.py: resize+center-crop
to IMAGE_SIZE (:24,:37-42), normalize to [-1,1], first caption per image
(:216), CLIP text embeddings in batches of 256 (:147-165), npy artifact
outputs (:178-262), x2 augmentation (:266-326), visualization/analysis
(:328-423), and run_pipeline orchestration with the val split rule
val = max(1000, n/5) (:511).

COCO acquisition differences: the reference pulls via the FiftyOne zoo
(:44-68) and cocodataset.org caption archives (:70-145). This environment
has no network egress, so `load_coco_from_dir` consumes a local COCO
layout (images dir + captions_*.json) and the pipeline accepts any
(images, captions) pair; the zoo hook stays behind an availability gate.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Optional, Sequence

import numpy as np

IMAGE_SIZE = 64  # ref :24


def resize_center_crop(img: np.ndarray, size: int = IMAGE_SIZE) -> np.ndarray:
    """uint8/float HWC -> float32 [size, size, 3] in [-1, 1].

    Resize the short side to `size` (bilinear) then center-crop — the
    torchvision Resize+CenterCrop composition the reference uses (:37-42).
    """
    from PIL import Image

    if img.dtype != np.uint8:
        img = np.clip(img, 0, 255).astype(np.uint8)
    pil = Image.fromarray(img)
    w, h = pil.size
    scale = size / min(w, h)
    nw, nh = round(w * scale), round(h * scale)
    pil = pil.resize((nw, nh), Image.BILINEAR)
    left, top = (nw - size) // 2, (nh - size) // 2
    pil = pil.crop((left, top, left + size, top + size))
    arr = np.asarray(pil.convert("RGB"), np.float32) / 255.0
    return (arr - 0.5) / 0.5  # Normalize(0.5, 0.5) -> [-1, 1]


def load_coco_from_dir(
    image_dir: str, captions_json: str, max_samples: int = -1
) -> tuple[list, list]:
    """Local COCO layout -> (image paths, first-caption-per-image).

    captions_json follows the official annotations schema
    (images[{id, file_name}], annotations[{image_id, caption}]) that the
    reference downloads from cocodataset.org (:70-145).
    """
    with open(captions_json) as f:
        meta = json.load(f)
    id_to_file = {im["id"]: im["file_name"] for im in meta["images"]}
    id_to_caps: dict[int, list[str]] = {}
    for ann in meta["annotations"]:
        id_to_caps.setdefault(ann["image_id"], []).append(ann["caption"])

    paths, captions = [], []
    for img_id, fname in sorted(id_to_file.items()):
        p = os.path.join(image_dir, fname)
        caps = id_to_caps.get(img_id)
        if caps and os.path.exists(p):
            paths.append(p)
            captions.append(caps[0])  # first caption per image (ref :216)
        if 0 < max_samples <= len(paths):
            break
    return paths, captions


def download_coco_with_fiftyone(split: str = "train", max_samples: int = 5000):
    """FiftyOne zoo hook (ref :44-68); gated on availability/egress."""
    try:
        import fiftyone.zoo as foz  # type: ignore
    except ImportError as e:
        raise RuntimeError(
            "fiftyone is not installed and this environment has no network "
            "egress; use load_coco_from_dir with a local COCO layout"
        ) from e
    ds = foz.load_zoo_dataset(
        "coco-2017", split=split, label_types=["detections"], max_samples=max_samples
    )
    paths, captions = [], []
    for sample in ds:
        paths.append(sample.filepath)
        captions.append("")
    return paths, captions


def extract_clip_text_embeddings(
    captions: Sequence[str], clip_params=None, batch_size: int = 256
) -> np.ndarray:
    """Captions -> float32 [N, 512] CLIP embeddings, batched (ref :147-165)."""
    from moegan_tpu.models.clip_jax import encode_text, load_clip_params

    clip_params = clip_params or load_clip_params()
    out = []
    for i in range(0, len(captions), batch_size):
        out.append(np.asarray(encode_text(clip_params, list(captions[i : i + batch_size]))))
    return np.concatenate(out, axis=0).astype(np.float32)


def process_dataset(
    image_paths_or_arrays,
    captions: Sequence[str],
    output_dir: str,
    split: str = "train",
    *,
    image_size: int = IMAGE_SIZE,
    clip_params=None,
) -> dict:
    """Images + captions -> mscoco_{split}_* npy artifacts + metadata pkl."""
    from PIL import Image

    imgs = np.empty((len(captions), image_size, image_size, 3), np.float32)
    for i, item in enumerate(image_paths_or_arrays):
        if isinstance(item, str):
            item = np.asarray(Image.open(item).convert("RGB"))
        imgs[i] = resize_center_crop(item, image_size)

    embeds = extract_clip_text_embeddings(captions, clip_params)

    os.makedirs(output_dir, exist_ok=True)
    prefix = os.path.join(output_dir, f"mscoco_{split}")
    np.save(f"{prefix}_images.npy", np.transpose(imgs, (0, 3, 1, 2)))  # CHW contract
    np.save(f"{prefix}_text_embeddings.npy", embeds)
    np.save(f"{prefix}_captions.npy", np.asarray(list(captions), object))
    metadata = [
        {"index": i, "caption": c, "image_size": image_size}
        for i, c in enumerate(captions)
    ]
    with open(f"{prefix}_metadata.pkl", "wb") as f:
        pickle.dump(metadata, f)
    return {"n": len(captions), "prefix": prefix}


def analyze_dataset(captions: Sequence[str], output_dir: Optional[str] = None) -> dict:
    """Caption statistics (ref analyze_dataset :364-423) ->
    dataset_statistics.json."""
    lengths = [len(str(c).split()) for c in captions]
    words: dict[str, int] = {}
    for c in captions:
        for w in str(c).lower().split():
            words[w] = words.get(w, 0) + 1
    top_words = sorted(words.items(), key=lambda kv: -kv[1])[:20]
    stats = {
        "num_samples": len(captions),
        "avg_caption_length": float(np.mean(lengths)) if lengths else 0.0,
        "min_caption_length": int(min(lengths)) if lengths else 0,
        "max_caption_length": int(max(lengths)) if lengths else 0,
        "top_words": top_words,
    }
    if output_dir:
        with open(os.path.join(output_dir, "dataset_statistics.json"), "w") as f:
            json.dump(stats, f, indent=2)
    return stats


def visualize_dataset(
    images_m11: np.ndarray, captions, output_dir: str, n: int = 16
):
    """Sample grid + caption-length histogram (ref :328-362); best-effort."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        os.makedirs(output_dir, exist_ok=True)
        n = min(n, len(images_m11))
        cols = int(np.ceil(np.sqrt(n)))
        fig, axes = plt.subplots(cols, cols, figsize=(2 * cols, 2 * cols))
        for i, ax in enumerate(np.asarray(axes).flat):
            ax.axis("off")
            if i < n:
                ax.imshow((images_m11[i] + 1) / 2)
                if captions is not None:
                    ax.set_title(str(captions[i])[:30], fontsize=6)
        fig.tight_layout()
        fig.savefig(os.path.join(output_dir, "sample_grid.png"), dpi=80)
        plt.close(fig)

        lengths = [len(str(c).split()) for c in captions] if captions is not None else []
        if lengths:
            fig = plt.figure(figsize=(6, 3))
            plt.hist(lengths, bins=20)
            plt.xlabel("caption length (words)")
            fig.savefig(os.path.join(output_dir, "caption_lengths.png"), dpi=80)
            plt.close(fig)
    except Exception as e:
        print(f"visualization skipped: {e}")


def run_pipeline(
    image_paths_or_arrays,
    captions: Sequence[str],
    output_dir: str,
    *,
    augment: bool = True,
    aug_factor: int = 2,
    image_size: int = IMAGE_SIZE,
    clip_params=None,
    seed: int = 0,
) -> dict:
    """Full pipeline: process -> viz -> analyze -> augment -> val split.

    Validation split size = max(1000, n // 5) capped at n // 2 (ref :511
    uses max(1000, n/5); tiny datasets keep at least half for training).
    """
    from moegan_tpu.data.augment import create_augmentations
    from moegan_tpu.data.datasets import ProcessedMSCOCODataset

    info = process_dataset(
        image_paths_or_arrays, captions, output_dir, "train",
        image_size=image_size, clip_params=clip_params,
    )
    ds = ProcessedMSCOCODataset.load(output_dir, "train", return_captions=True)

    visualize_dataset(ds.images, ds.captions, output_dir)
    stats = analyze_dataset(captions, output_dir)

    n = len(ds)
    n_val = min(max(1000, n // 5), n // 2)
    val = ProcessedMSCOCODataset(
        ds.images[:n_val], ds.text_embeddings[:n_val],
        ds.captions[:n_val] if ds.captions is not None else None,
    )
    val.save(output_dir, "validation")

    train = ProcessedMSCOCODataset(
        ds.images[n_val:], ds.text_embeddings[n_val:],
        ds.captions[n_val:] if ds.captions is not None else None,
    )
    train.save(output_dir, "train")

    if augment:
        ai, ae, ac = create_augmentations(
            train.images, train.text_embeddings, train.captions,
            aug_factor=aug_factor, seed=seed,
        )
        ProcessedMSCOCODataset(ai, ae, ac).save(output_dir, "train", augmented=True)

    return {"stats": stats, "n_train": n - n_val, "n_val": n_val}
