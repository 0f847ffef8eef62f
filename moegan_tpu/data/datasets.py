"""Dataset containers honoring the reference's npy artifact contract.

The reference pipeline (data_processing/data_processing_pipeline.py)
produces `mscoco_{split}_images.npy` ([-1,1] float32 CHW images),
`mscoco_{split}_text_embeddings.npy` (CLIP ViT-B/32, float32 [N,512]) and
`mscoco_{split}_captions.npy`; `ProcessedMSCOCODataset` (:425-471) serves
(image, embedding[, caption]) tuples. This module keeps that on-disk
contract byte-compatible (existing processed data drops in) while storing
images NHWC in host RAM for TPU-friendly feeding.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

import numpy as np


@dataclass
class ProcessedMSCOCODataset:
    """npy-backed dataset; mirrors reference :425-471 incl. file naming."""

    images: np.ndarray  # [N, H, W, 3] float32 in [-1, 1] (NHWC)
    text_embeddings: np.ndarray  # [N, 512] float32
    captions: Optional[np.ndarray] = None

    @classmethod
    def load(
        cls,
        data_dir: str,
        split: str = "train",
        *,
        augmented: bool = False,
        use_percentage: float = 1.0,
        return_captions: bool = False,
    ) -> "ProcessedMSCOCODataset":
        """Load `mscoco_{split}_*.npy` (or `_augmented_` variants).

        use_percentage mirrors sagemaker_train.py:24-68's SimpleDataset
        subsetting (the cloud run trains on 33% of the data, :202).
        """
        prefix = f"mscoco_{split}_augmented" if augmented else f"mscoco_{split}"
        images = np.load(os.path.join(data_dir, f"{prefix}_images.npy"), mmap_mode="r")
        embeds = np.load(os.path.join(data_dir, f"{prefix}_text_embeddings.npy"))
        captions = None
        cap_path = os.path.join(data_dir, f"{prefix}_captions.npy")
        if return_captions and os.path.exists(cap_path):
            captions = np.load(cap_path, allow_pickle=True)

        n = len(images)
        if use_percentage < 1.0:
            n = max(1, int(n * use_percentage))
        images = np.asarray(images[:n], np.float32)
        embeds = np.asarray(embeds[:n], np.float32)
        if captions is not None:
            captions = captions[:n]

        # Reference stores CHW; convert once to NHWC for the TPU.
        if images.ndim == 4 and images.shape[1] == 3 and images.shape[-1] != 3:
            images = np.transpose(images, (0, 2, 3, 1))
        return cls(np.ascontiguousarray(images), embeds, captions)

    def __len__(self) -> int:
        return len(self.images)

    def __getitem__(self, idx):
        if self.captions is not None:
            return self.images[idx], self.text_embeddings[idx], self.captions[idx]
        return self.images[idx], self.text_embeddings[idx]

    def save(self, data_dir: str, split: str = "train", *, augmented: bool = False):
        os.makedirs(data_dir, exist_ok=True)
        prefix = f"mscoco_{split}_augmented" if augmented else f"mscoco_{split}"
        # Persist CHW to stay byte-compatible with the reference artifacts.
        chw = np.transpose(self.images, (0, 3, 1, 2)).astype(np.float32)
        np.save(os.path.join(data_dir, f"{prefix}_images.npy"), chw)
        np.save(
            os.path.join(data_dir, f"{prefix}_text_embeddings.npy"),
            self.text_embeddings.astype(np.float32),
        )
        if self.captions is not None:
            np.save(
                os.path.join(data_dir, f"{prefix}_captions.npy"),
                np.asarray(self.captions, object),
            )


@dataclass
class EnhancedMSCOCODataset:
    """Cluster-labeled dataset — the reference EnhancedMSCOCODataset
    analog (moe/moe_integration.py:32-73): wraps a processed dataset with
    per-sample KMeans expert pseudo-labels (+ optional cluster
    descriptions) and serves (image, text_embedding, cluster_label)."""

    base: ProcessedMSCOCODataset
    cluster_labels: np.ndarray  # [N] int
    cluster_descriptions: Optional[list] = None

    def __post_init__(self):
        if len(self.cluster_labels) != len(self.base):
            raise ValueError(
                f"{len(self.cluster_labels)} labels for {len(self.base)} samples"
            )
        self.cluster_labels = np.asarray(self.cluster_labels, np.int32)

    @classmethod
    def from_dataset(
        cls,
        base: ProcessedMSCOCODataset,
        n_clusters: int = 5,
        seed: int = 42,
        clip_params=None,
    ) -> "EnhancedMSCOCODataset":
        """Cluster the text embeddings into pseudo-labels and (when CLIP
        params are given) name the clusters (ref :75-183)."""
        from moegan_tpu.prototype.training import (
            analyze_clusters,
            cluster_text_embeddings,
        )

        labels, _ = cluster_text_embeddings(base.text_embeddings, n_clusters, seed)
        descriptions = analyze_clusters(
            base.text_embeddings, labels, clip_params=clip_params, captions=base.captions
        )
        return cls(base, labels, descriptions)

    @property
    def images(self) -> np.ndarray:
        return self.base.images

    @property
    def text_embeddings(self) -> np.ndarray:
        return self.base.text_embeddings

    @property
    def captions(self):
        return self.base.captions

    @property
    def num_clusters(self) -> int:
        return int(self.cluster_labels.max()) + 1 if len(self.cluster_labels) else 0

    def __len__(self) -> int:
        return len(self.base)

    def __getitem__(self, idx):
        return self.images[idx], self.text_embeddings[idx], self.cluster_labels[idx]


# Procedural colored-shapes corpus: the offline stand-in for COCO when
# demonstrating that text conditioning actually conditions (the reference's
# core claim, README.md:92-97 / t2i_moe_gan.py:66-119). Class identity is
# (color, shape); captions are templated so a from-scratch embedder
# (models/toy_clip.py) can learn the text<->image alignment in minutes.
SHAPE_COLORS = {
    "red": (1.0, 0.1, 0.1),
    "green": (0.1, 0.9, 0.1),
    "blue": (0.15, 0.3, 1.0),
    "yellow": (1.0, 0.95, 0.1),
    "magenta": (1.0, 0.1, 0.9),
    "cyan": (0.1, 0.9, 0.9),
    "orange": (1.0, 0.55, 0.05),
    "white": (0.95, 0.95, 0.95),
}
SHAPE_KINDS = ("circle", "square", "triangle", "cross")
_CAPTION_TEMPLATES = (
    "a {color} {shape}",
    "the {color} {shape}",
    "a {color} {shape} on a dark background",
    "one {color} {shape} in the picture",
)


def shape_class_names() -> list:
    """All (color, shape) class captions in label order (C*S classes)."""
    return [
        f"a {color} {shape}" for color in SHAPE_COLORS for shape in SHAPE_KINDS
    ]


def _render_shape(kind: str, cx, cy, r, res: int, ss: int = 4) -> np.ndarray:
    """Antialiased [res,res] coverage mask via ss x ss supersampling."""
    n = res * ss
    ys, xs = (np.mgrid[0:n, 0:n] + 0.5) / n
    if kind == "circle":
        mask = (xs - cx) ** 2 + (ys - cy) ** 2 <= r**2
    elif kind == "square":
        mask = (np.abs(xs - cx) <= r * 0.9) & (np.abs(ys - cy) <= r * 0.9)
    elif kind == "triangle":
        # Upright isoceles triangle inscribed in the radius.
        mask = (
            (ys <= cy + r * 0.8)
            & (np.abs(xs - cx) <= ((ys - (cy - r)) / (2 * r * 0.9 + 1e-9)) * r)
        )
    elif kind == "cross":
        arm = r * 0.35
        mask = ((np.abs(xs - cx) <= arm) & (np.abs(ys - cy) <= r)) | (
            (np.abs(ys - cy) <= arm) & (np.abs(xs - cx) <= r)
        )
    else:
        raise ValueError(kind)
    return mask.astype(np.float32).reshape(res, ss, res, ss).mean((1, 3))


def shapes_dataset(
    n: int = 4096, resolution: int = 16, seed: int = 0
) -> tuple["ProcessedMSCOCODataset", np.ndarray]:
    """Colored shapes + template captions.

    Returns (dataset, class_labels) where dataset carries [-1,1] NHWC
    images and per-sample captions (text_embeddings start as zeros — fill
    them with a trained text tower, e.g. toy_clip.encode_text). Labels
    index into shape_class_names() (color-major).
    """
    rng = np.random.default_rng(seed)
    colors = list(SHAPE_COLORS)
    images = np.zeros((n, resolution, resolution, 3), np.float32)
    captions = np.empty(n, object)
    labels = np.zeros(n, np.int32)
    for i in range(n):
        ci = rng.integers(len(colors))
        si = rng.integers(len(SHAPE_KINDS))
        color, shape = colors[ci], SHAPE_KINDS[si]
        labels[i] = ci * len(SHAPE_KINDS) + si
        cx, cy = rng.uniform(0.35, 0.65, 2)
        r = rng.uniform(0.22, 0.34)
        mask = _render_shape(shape, cx, cy, r, resolution)
        bg = rng.uniform(0.03, 0.10) + 0.02 * rng.normal(size=(resolution, resolution, 1))
        rgb = np.asarray(SHAPE_COLORS[color], np.float32) * rng.uniform(0.85, 1.0)
        img01 = bg + mask[..., None] * (rgb - bg)
        images[i] = np.clip(img01 * 2.0 - 1.0, -1.0, 1.0)
        tmpl = _CAPTION_TEMPLATES[rng.integers(len(_CAPTION_TEMPLATES))]
        captions[i] = tmpl.format(color=color, shape=shape)
    embeds = np.zeros((n, 512), np.float32)
    return ProcessedMSCOCODataset(images, embeds, captions), labels


def synthetic_dataset(
    n: int = 64, resolution: int = 16, seed: int = 0, text_dim: int = 512
) -> ProcessedMSCOCODataset:
    """Tiny synthetic fixture (the rebuild's analog of the reference's
    100-sample toy validation run, SURVEY.md §4). Images are smooth
    color fields weakly correlated with their text embeddings so a few
    train steps have signal."""
    rng = np.random.default_rng(seed)
    embeds = rng.normal(size=(n, text_dim)).astype(np.float32)
    ys, xs = np.mgrid[0:resolution, 0:resolution] / resolution
    images = np.zeros((n, resolution, resolution, 3), np.float32)
    for i in range(n):
        phase = embeds[i, :3]
        images[i, ..., 0] = np.sin(2 * np.pi * (xs + phase[0]))
        images[i, ..., 1] = np.sin(2 * np.pi * (ys + phase[1]))
        images[i, ..., 2] = np.sin(2 * np.pi * (xs * ys + phase[2]))
    images += 0.05 * rng.normal(size=images.shape).astype(np.float32)
    captions = np.asarray([f"synthetic sample {i}" for i in range(n)], object)
    return ProcessedMSCOCODataset(
        np.clip(images, -1, 1).astype(np.float32), embeds, captions
    )
