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


def _towers(clip_params):
    """Tower pack dispatch: a ``{"toy": ...}`` pytree (models/toy_clip.py)
    routes to the from-scratch embedder, anything else to the CLIP ViT-B/32
    towers. Structural (pytree-key) dispatch, so it is jit-stable — the
    trace specializes per params structure, never on traced values."""
    if isinstance(clip_params, dict) and "toy" in clip_params:
        from moegan_tpu.models import toy_clip

        toy = clip_params["toy"]
        return (
            lambda x: toy_clip.preprocess(toy, x),
            lambda x: toy_clip.image_features_preprocessed(toy, x),
        )
    return (
        clip_jax.preprocess_for_clip,
        lambda x: clip_jax.image_features_preprocessed(clip_params, x),
    )


def _cosine_loss(feats: jax.Array, text_embeddings: jax.Array) -> jax.Array:
    feats = feats / (jnp.linalg.norm(feats, axis=-1, keepdims=True) + 1e-8)
    text = text_embeddings.astype(jnp.float32)
    text = text / (jnp.linalg.norm(text, axis=-1, keepdims=True) + 1e-8)
    sim = jnp.sum(feats * text, axis=-1)
    sim = jnp.nan_to_num(sim)  # ref :116
    return 1.0 - jnp.mean(sim)


def clip_loss(
    clip_params,
    images_m11: jax.Array,
    text_embeddings: jax.Array,
    *,
    stop_gradient: bool = True,
) -> jax.Array:
    """1 - mean cosine similarity between CLIP(image) and text embeddings."""
    pre, features = _towers(clip_params)
    feats = features(pre(images_m11))
    if stop_gradient:
        feats = jax.lax.stop_gradient(feats)
    return _cosine_loss(feats, text_embeddings)


def multi_level_clip_loss(
    clip_params,
    images_by_res: dict,
    text_embeddings: jax.Array,
    *,
    stop_gradient: bool = True,
) -> dict:
    """Per-resolution CLIP losses from ONE batched ViT forward.

    The reference runs a separate CLIP encode per RGB tap
    (t2i_moe_gan.py:1385-1387); with 4 taps that is 4 full ViT passes per
    step. Every tap is resized to 224 anyway, so the taps concatenate on
    the batch axis into a single [n_taps*B, 224, 224, 3] tower pass —
    identical per-sample math, ~4x less ViT launch/weight traffic. When
    gradients flow (stop_gradient=False) the tower is rematerialized
    (jax.checkpoint) instead of storing 12 layers of activations for the
    n_taps*B batch.

    Returns {resolution: scalar loss}.
    """
    resolutions = sorted(images_by_res)
    if not resolutions:
        return {}
    pre, features = _towers(clip_params)
    x = jnp.concatenate([pre(images_by_res[r]) for r in resolutions], axis=0)

    def tower(params, x):
        return _towers(params)[1](x)

    if stop_gradient:
        feats = jax.lax.stop_gradient(tower(clip_params, jax.lax.stop_gradient(x)))
    else:
        feats = jax.checkpoint(tower)(clip_params, x)

    B = text_embeddings.shape[0]
    return {
        r: _cosine_loss(feats[i * B : (i + 1) * B], text_embeddings)
        for i, r in enumerate(resolutions)
    }


def clip_score(clip_params, images_m11: jax.Array, text_embeddings: jax.Array) -> jax.Array:
    """CLIPScore = 100 * max(0, cos sim), the standard eval metric."""
    pre, features = _towers(clip_params)
    feats = features(pre(images_m11))
    feats = feats / (jnp.linalg.norm(feats, axis=-1, keepdims=True) + 1e-8)
    text = text_embeddings.astype(jnp.float32)
    text = text / (jnp.linalg.norm(text, axis=-1, keepdims=True) + 1e-8)
    sim = jnp.sum(feats * text, axis=-1)
    return 100.0 * jnp.mean(jnp.maximum(sim, 0.0))
