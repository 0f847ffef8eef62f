"""Offline dataset augmentation (reference create_augmentations,
data_processing_pipeline.py:266-326): x2 per image — horizontal flip,
color jitter (brightness/contrast/saturation), random affine (5 deg,
5% translate, 0.95-1.05 scale) — with text embeddings duplicated.
Implemented in numpy/scipy over [-1,1] NHWC arrays (torchvision isn't in
this image)."""

from __future__ import annotations

import numpy as np


def _to01(x):
    return (x + 1.0) * 0.5


def _tom11(x):
    return np.clip(x * 2.0 - 1.0, -1.0, 1.0)


def hflip(img_m11: np.ndarray) -> np.ndarray:
    return img_m11[:, ::-1, :]


def color_jitter(
    img_m11: np.ndarray, rng: np.random.Generator,
    brightness: float = 0.2, contrast: float = 0.2, saturation: float = 0.2,
) -> np.ndarray:
    x = _to01(img_m11)
    b = rng.uniform(1 - brightness, 1 + brightness)
    c = rng.uniform(1 - contrast, 1 + contrast)
    s = rng.uniform(1 - saturation, 1 + saturation)
    x = x * b
    mean = x.mean()
    x = (x - mean) * c + mean
    gray = x.mean(axis=-1, keepdims=True)
    x = (x - gray) * s + gray
    return _tom11(np.clip(x, 0, 1))


def random_affine(
    img_m11: np.ndarray, rng: np.random.Generator,
    max_deg: float = 5.0, max_translate: float = 0.05,
    scale_range: tuple = (0.95, 1.05),
) -> np.ndarray:
    """Rotation + translation + scale with bilinear resampling, zeros fill."""
    H, W, C = img_m11.shape
    theta = np.deg2rad(rng.uniform(-max_deg, max_deg))
    tx = rng.uniform(-max_translate, max_translate) * W
    ty = rng.uniform(-max_translate, max_translate) * H
    s = rng.uniform(*scale_range)

    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    cos, sin = np.cos(theta) / s, np.sin(theta) / s
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    # inverse map: output pixel -> source pixel
    x0 = xs - cx - tx
    y0 = ys - cy - ty
    src_x = cos * x0 + sin * y0 + cx
    src_y = -sin * x0 + cos * y0 + cy

    x0i = np.floor(src_x).astype(int)
    y0i = np.floor(src_y).astype(int)
    fx = src_x - x0i
    fy = src_y - y0i

    def tap(yi, xi):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        out = np.zeros((H, W, C), np.float32)
        yc, xc = np.clip(yi, 0, H - 1), np.clip(xi, 0, W - 1)
        out[:] = img_m11[yc, xc]
        out[~valid] = 0.0
        return out

    out = (
        tap(y0i, x0i) * ((1 - fy) * (1 - fx))[..., None]
        + tap(y0i, x0i + 1) * ((1 - fy) * fx)[..., None]
        + tap(y0i + 1, x0i) * (fy * (1 - fx))[..., None]
        + tap(y0i + 1, x0i + 1) * (fy * fx)[..., None]
    )
    return np.clip(out, -1, 1).astype(np.float32)


AUGMENTATIONS = (hflip, color_jitter, random_affine)


def create_augmentations(
    images: np.ndarray,
    text_embeddings: np.ndarray,
    captions=None,
    *,
    aug_factor: int = 2,  # ref default x2 (:266)
    seed: int = 0,
):
    """Returns (aug_images, aug_embeddings, aug_captions): originals plus
    aug_factor augmented copies each, embeddings/captions duplicated."""
    rng = np.random.default_rng(seed)
    out_imgs = [images]
    out_embs = [text_embeddings]
    out_caps = [captions] if captions is not None else None
    for _ in range(aug_factor):
        batch = np.empty_like(images)
        for i, img in enumerate(images):
            fn = AUGMENTATIONS[rng.integers(len(AUGMENTATIONS))]
            batch[i] = fn(img, rng) if fn is not hflip else hflip(img)
        out_imgs.append(batch)
        out_embs.append(text_embeddings)
        if out_caps is not None:
            out_caps.append(captions)
    images_aug = np.concatenate(out_imgs, axis=0)
    embs_aug = np.concatenate(out_embs, axis=0)
    caps_aug = np.concatenate(out_caps, axis=0) if out_caps is not None else None
    return images_aug, embs_aug, caps_aug
