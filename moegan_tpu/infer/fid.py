"""FID evaluation (reference calculate_fid_for_inference,
moegan/inference.py:140-249).

The reference extracts InceptionV3 pool-2048 features in batches of 8,
fits Gaussians, and computes the Frechet distance with scipy sqrtm; when
`reference_stats.npz` is missing it falls back to mu=0, Sigma=I (:230-240)
— both behaviors reproduced. Feature extraction is pluggable:

- inception_feature_extractor (default): the JAX InceptionV3 pool-2048
  tower (models/inception_jax.py) — the reference's feature space
  (inference.py:161-208). With converted IMAGENET1K_V1 weights
  (scripts/convert_inception.py) this matches the reference numerics;
  without weights on disk it runs deterministic random-init features
  (protocol-only, clearly not semantic).
- clip_feature_extractor: the JAX CLIP image tower (512-d) — the
  well-known CLIP-FID variant, kept as a labeled alternative.
- any callable images[-1,1] NHWC -> [N, D] features.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Union

import numpy as np


def gaussian_stats(features: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(mu, sigma) of a feature matrix [N, D] (ref :196-208)."""
    mu = np.mean(features, axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, np.atleast_2d(sigma)


def _psd_sqrtm(mat: np.ndarray) -> np.ndarray:
    """Matrix square root; scipy sqrtm when available (reference parity),
    else symmetric-eigendecomposition PSD sqrt.

    scipy warns loudly on singular products (common with small sample
    counts); the warning is suppressed and a non-finite result falls
    through to the eigh path so eval logs stay clean."""
    try:
        import warnings

        from scipy import linalg

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            res = linalg.sqrtm(mat)
        res = res[0] if isinstance(res, tuple) else res
        if np.isfinite(res).all():
            return res
    except Exception:
        pass
    w, v = np.linalg.eigh((mat + mat.T) / 2)
    w = np.clip(w, 0, None)
    return (v * np.sqrt(w)) @ v.T


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """FID between two Gaussians (ref :210-228)."""
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2

    covmean = _psd_sqrtm(sigma1 @ sigma2)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = _psd_sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


def _batched_extractor(feats_fn: Callable, batch_size: int) -> Callable:
    """Wrap a jitted [B,...] -> [B,D] feature fn into a padded, batched
    numpy extractor with ONE compiled shape (ref batches of 8, :190-197)."""
    import jax.numpy as jnp

    def extract(images_m11: np.ndarray) -> np.ndarray:
        out = []
        n = len(images_m11)
        bs = batch_size
        for i in range(0, n, bs):
            chunk = np.asarray(images_m11[i : i + bs], np.float32)
            if len(chunk) < bs:  # pad to keep one compiled shape
                pad = np.zeros((bs - len(chunk), *chunk.shape[1:]), np.float32)
                res = np.asarray(feats_fn(jnp.asarray(np.concatenate([chunk, pad]))))[: len(chunk)]
            else:
                res = np.asarray(feats_fn(jnp.asarray(chunk)))
            out.append(res)
        return np.concatenate(out, axis=0)

    return extract


def clip_feature_extractor(clip_params, batch_size: int = 8) -> Callable:
    """JAX CLIP image tower as the feature source (CLIP-FID variant)."""
    import jax

    from moegan_tpu.models import clip_jax

    # params as an ARGUMENT, not a closure capture: captured arrays embed
    # in the HLO as constants (~100 MB for the tower), which overflows the
    # axon tunnel's compile-request size limit (HTTP 413).
    @jax.jit
    def feats(params, images):
        return clip_jax.image_features(params, images)

    import jax.numpy as jnp

    device_params = jax.tree_util.tree_map(jnp.asarray, clip_params)
    return _batched_extractor(lambda im: feats(device_params, im), batch_size)


def inception_feature_extractor(
    inception_params=None,
    batch_size: int = 8,
    variant: str = "torchvision",
) -> Callable:
    """JAX InceptionV3 pool-2048 features — the reference's FID feature
    space (inference.py:161-208). Loads converted weights from
    INCEPTION_WEIGHTS_PATH when params aren't passed (random init
    fallback keeps the protocol runnable without weights)."""
    import jax

    from moegan_tpu.models import inception_jax

    if inception_params is None:
        inception_params = inception_jax.load_inception_params()

    # params as an ARGUMENT (see clip_feature_extractor): closure-captured
    # weights become HLO constants and overflow the tunnel compile limit.
    @functools.partial(jax.jit, static_argnames=("variant",))
    def feats(params, images, variant):
        return inception_jax.features(params, images, variant=variant)

    import jax.numpy as jnp

    device_params = jax.tree_util.tree_map(jnp.asarray, inception_params)
    return _batched_extractor(
        lambda im: feats(device_params, im, variant), batch_size
    )


class FIDEvaluator:
    """End-to-end FID with reference-stats file + identity fallback.

    Default extractor is the InceptionV3 pool-2048 tower (reference
    feature space + 2048-d mu=0/Sigma=I fallback, inference.py:230-240)."""

    def __init__(
        self,
        extractor: Union[Callable, None] = None,
        reference_stats_path: Optional[str] = None,
        feature_dim: int = 2048,
    ):
        if extractor is None:
            extractor = inception_feature_extractor()
        self.extractor = extractor
        self.feature_dim = feature_dim
        self.ref_mu: Optional[np.ndarray] = None
        self.ref_sigma: Optional[np.ndarray] = None
        if reference_stats_path:
            self.load_reference_stats(reference_stats_path)

    def load_reference_stats(self, path: str):
        import os

        if os.path.exists(path):
            data = np.load(path)
            self.ref_mu, self.ref_sigma = data["mu"], data["sigma"]
        else:
            # Reference fallback: standard-normal stats (inference.py:230-240).
            self.ref_mu = np.zeros(self.feature_dim)
            self.ref_sigma = np.eye(self.feature_dim)

    def set_reference_images(self, images_m11: np.ndarray):
        feats = self.extractor(images_m11)
        self.ref_mu, self.ref_sigma = gaussian_stats(feats)
        self.feature_dim = feats.shape[-1]

    def save_reference_stats(self, path: str):
        np.savez(path, mu=self.ref_mu, sigma=self.ref_sigma)

    def __call__(self, images_m11: np.ndarray) -> float:
        if self.ref_mu is None:
            self.load_reference_stats("reference_stats.npz")
        feats = self.extractor(images_m11)
        mu, sigma = gaussian_stats(feats)
        return frechet_distance(mu, sigma, self.ref_mu, self.ref_sigma)
