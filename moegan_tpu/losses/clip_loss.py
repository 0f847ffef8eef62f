"""Multi-level CLIP perceptual loss.

Reference CLIPLoss (t2i_moe_gan.py:66-119): clamp images to [-1,1],
bilinear-resize to 224^2, CLIP-encode, 1 - mean cosine similarity against
the (precomputed) text embeddings. The reference computes image features
under torch.no_grad() (:99-101), which means the CLIP loss is *monitored*
but contributes no generator gradient; `stop_gradient=True` reproduces
that for parity, `False` gives the fixed, gradient-carrying variant
(SURVEY.md §7 "numerical-parity traps").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from moegan_tpu.models import clip_jax


def clip_loss(
    clip_params,
    images_m11: jax.Array,
    text_embeddings: jax.Array,
    *,
    stop_gradient: bool = True,
) -> jax.Array:
    """1 - mean cosine similarity between CLIP(image) and text embeddings."""
    feats = clip_jax.image_features(clip_params, images_m11)
    if stop_gradient:
        feats = jax.lax.stop_gradient(feats)
    feats = feats / (jnp.linalg.norm(feats, axis=-1, keepdims=True) + 1e-8)
    text = text_embeddings.astype(jnp.float32)
    text = text / (jnp.linalg.norm(text, axis=-1, keepdims=True) + 1e-8)
    sim = jnp.sum(feats * text, axis=-1)
    sim = jnp.nan_to_num(sim)  # ref :116
    return 1.0 - jnp.mean(sim)


def clip_score(clip_params, images_m11: jax.Array, text_embeddings: jax.Array) -> jax.Array:
    """CLIPScore = 100 * max(0, cos sim), the standard eval metric."""
    feats = clip_jax.image_features(clip_params, images_m11)
    feats = feats / (jnp.linalg.norm(feats, axis=-1, keepdims=True) + 1e-8)
    text = text_embeddings.astype(jnp.float32)
    text = text / (jnp.linalg.norm(text, axis=-1, keepdims=True) + 1e-8)
    sim = jnp.sum(feats * text, axis=-1)
    return 100.0 * jnp.mean(jnp.maximum(sim, 0.0))
