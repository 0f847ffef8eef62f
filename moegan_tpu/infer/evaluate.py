"""On-device FID / CLIPScore evaluation loop (BASELINE.json config 5).

The reference computes FID per serving request (inference.py:140-249) and
never publishes dataset-level numbers (BASELINE.md). This evaluator
establishes them: generate N samples conditioned on the dataset's text
embeddings, extract features on-device in fixed-shape batches, and report
FID against the real images plus CLIPScore against the conditioning text.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from moegan_tpu.config import GeneratorConfig
from moegan_tpu.infer.fid import (
    clip_feature_extractor,
    frechet_distance,
    gaussian_stats,
    inception_feature_extractor,
)
from moegan_tpu.models.generator import AuroraGenerator


def evaluate_fid_clipscore(
    g_params,
    dataset,
    clip_params,
    *,
    cfg: GeneratorConfig = GeneratorConfig(),
    num_samples: int = 10_000,
    batch_size: int = 64,
    truncation_psi: float = 1.0,
    seed: int = 0,
    feature_source: str = "inception",
    inception_params=None,
) -> dict:
    """Returns {'fid', 'clip_score', 'expert_utilization', ...}.

    FID features come from the InceptionV3 pool-2048 tower by default
    (the reference's feature space, inference.py:161-208; converted
    weights via scripts/convert_inception.py) — feature_source="clip"
    selects the CLIP-FID variant instead. CLIPScore is cosine similarity
    x100 between CLIP image features and the conditioning text
    embeddings, computed either way.
    """
    gen = AuroraGenerator(cfg)
    n = min(num_samples, len(dataset))
    n = (n // batch_size) * batch_size
    if n == 0:
        raise ValueError(f"dataset ({len(dataset)}) smaller than batch {batch_size}")

    @partial(jax.jit, static_argnames=())
    def gen_batch(params, z, text):
        out = gen.apply(
            {"params": params}, z, text, truncation_psi=truncation_psi, training=False
        )
        util = jnp.mean(out.routing[-1].reshape(-1, cfg.num_experts), axis=0)
        return jnp.clip(out.image, -1, 1), util

    clip_extract = clip_feature_extractor(clip_params, batch_size=min(batch_size, 32))
    if feature_source == "inception":
        fid_extract = inception_feature_extractor(
            inception_params, batch_size=min(batch_size, 32)
        )
    elif feature_source == "clip":
        fid_extract = clip_extract
    else:
        raise ValueError(f"unknown feature_source {feature_source!r}")
    key = jax.random.PRNGKey(seed)

    fake_feats, real_feats, sims, utils_ = [], [], [], []
    for i in range(0, n, batch_size):
        text = jnp.asarray(dataset.text_embeddings[i : i + batch_size])
        z = jax.random.normal(
            jax.random.fold_in(key, i), (batch_size, cfg.latent_dim), jnp.float32
        )
        fake, util = gen_batch(g_params, z, text)
        utils_.append(np.asarray(util))

        fake_np = np.asarray(fake)
        real_np = np.asarray(dataset.images[i : i + batch_size], np.float32)
        fake_feats.append(fid_extract(fake_np))
        real_feats.append(fid_extract(real_np))

        # CLIPScore: CLIP image features vs conditioning text embeddings.
        cf = clip_extract(fake_np) if fid_extract is not clip_extract else fake_feats[-1]
        tn = np.asarray(text, np.float32)
        if cf.shape[-1] == tn.shape[-1]:  # CLIP embedding space only
            fn = cf / (np.linalg.norm(cf, axis=-1, keepdims=True) + 1e-8)
            tn = tn / (np.linalg.norm(tn, axis=-1, keepdims=True) + 1e-8)
            sims.append(np.clip((fn * tn).sum(-1), 0, None))

    fake_feats = np.concatenate(fake_feats)
    real_feats = np.concatenate(real_feats)
    mu_f, sig_f = gaussian_stats(fake_feats)
    mu_r, sig_r = gaussian_stats(real_feats)
    return {
        "fid": frechet_distance(mu_f, sig_f, mu_r, sig_r),
        "fid_feature_source": feature_source,
        "clip_score": float(100.0 * np.concatenate(sims).mean()) if sims else None,
        "num_samples": n,
        "expert_utilization": np.mean(utils_, axis=0).tolist(),
    }
