"""CLIP ViT-B/32 (image + text towers) in pure JAX/flax.

The reference leans on the `openai-clip` PyTorch package
(t2i_moe_gan.py:32-64) for (a) the perceptual CLIP loss image tower
(:66-119), (b) prompt encoding at inference (:1672-1709), and (c) the data
pipeline's precomputed text embeddings
(data_processing_pipeline.py:147-165). This module provides the same
capabilities TPU-natively:

- `CLIPImageTower` / `CLIPTextTower`: faithful ViT-B/32 architecture
  (patch 32, width 768, 12 layers / text width 512, 12 layers, causal),
  bf16 matmuls, jittable.
- `load_clip_params(path)`: converts an OpenAI/HF CLIP checkpoint
  (state-dict .pt/.bin or HF safetensors for openai/clip-vit-base-patch32)
  into this module's parameter pytree.
- `init_clip_params(seed)`: deterministic random init used when no
  pretrained weights are available on disk (this environment has no
  network egress). All loss/FID/CLIPScore machinery runs identically;
  semantic alignment obviously requires real weights — drop a checkpoint
  path into CLIP_WEIGHTS_PATH or pass `weights=` to get it.
- `tokenize(texts)`: byte-level fallback tokenizer into the 49408-entry
  vocab space with BOS/EOS framing, matching CLIP's 77-token context. The
  real BPE merges table ships with the weights; when only architecture
  parity is available the fallback keeps prompt->image end-to-end paths
  deterministic and testable.
"""

from __future__ import annotations

import os
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

IMAGE_RESOLUTION = 224
PATCH_SIZE = 32
VISION_WIDTH = 768
VISION_LAYERS = 12
VISION_HEADS = 12
EMBED_DIM = 512
TEXT_WIDTH = 512
TEXT_LAYERS = 12
TEXT_HEADS = 8
CONTEXT_LENGTH = 77
VOCAB_SIZE = 49408

CLIP_WEIGHTS_ENV = "CLIP_WEIGHTS_PATH"

# CLIP uses LayerNorm eps 1e-5 (both the OpenAI package and HF CLIPConfig);
# flax's 1e-6 default drifts ~1e-5 per block, caught by the torch parity test.
LN_EPS = 1e-5


class QuickGELU(nn.Module):
    @nn.compact
    def __call__(self, x):
        return x * jax.nn.sigmoid(1.702 * x)


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    causal: bool = False
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):  # [B, T, W]
        cd = self.compute_dtype
        W, H = self.width, self.heads
        hd = W // H

        def attn(y):
            qkv = nn.Dense(3 * W, name="qkv")(y.astype(cd))
            q, k, v = jnp.split(qkv, 3, axis=-1)
            B, T, _ = q.shape
            q = q.reshape(B, T, H, hd)
            k = k.reshape(B, T, H, hd)
            v = v.reshape(B, T, H, hd)
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
            ) / np.sqrt(hd)
            if self.causal:
                mask = jnp.tril(jnp.ones((T, T), bool))
                logits = jnp.where(mask[None, None], logits, -1e9)
            p = jax.nn.softmax(logits, axis=-1).astype(cd)
            o = jnp.einsum("bhqk,bkhd->bqhd", p, v, preferred_element_type=jnp.float32)
            return nn.Dense(W, name="out")(o.reshape(B, T, W).astype(cd))

        x = x + attn(nn.LayerNorm(epsilon=LN_EPS, dtype=jnp.float32, name="ln_1")(x))
        h = nn.LayerNorm(epsilon=LN_EPS, dtype=jnp.float32, name="ln_2")(x)
        h = nn.Dense(4 * W, name="mlp_fc")(h.astype(cd))
        h = QuickGELU()(h)
        h = nn.Dense(W, name="mlp_proj")(h)
        return x + h


class CLIPImageTower(nn.Module):
    """ViT-B/32 visual encoder: [B, 224, 224, 3] (CLIP-normalized) -> [B, 512]."""

    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        cd = self.compute_dtype
        grid = IMAGE_RESOLUTION // PATCH_SIZE
        x = nn.Conv(
            VISION_WIDTH,
            (PATCH_SIZE, PATCH_SIZE),
            strides=(PATCH_SIZE, PATCH_SIZE),
            use_bias=False,
            dtype=cd,
            name="patch_embed",
        )(x.astype(cd))
        B = x.shape[0]
        x = x.reshape(B, grid * grid, VISION_WIDTH)

        cls = self.param("class_embedding", nn.initializers.normal(0.02), (VISION_WIDTH,))
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, VISION_WIDTH)).astype(cd), x], axis=1)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (grid * grid + 1, VISION_WIDTH),
        )
        x = x + pos[None].astype(cd)
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=jnp.float32, name="ln_pre")(x)
        for i in range(VISION_LAYERS):
            x = ResidualAttentionBlock(
                VISION_WIDTH, VISION_HEADS, compute_dtype=cd, name=f"block_{i}"
            )(x)
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=jnp.float32, name="ln_post")(x[:, 0])
        proj = self.param(
            "proj", nn.initializers.normal(VISION_WIDTH**-0.5), (VISION_WIDTH, EMBED_DIM)
        )
        return (x.astype(jnp.float32) @ proj).astype(jnp.float32)


class CLIPTextTower(nn.Module):
    """CLIP text encoder: token ids [B, 77] -> [B, 512]."""

    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, tokens):
        cd = self.compute_dtype
        emb = self.param(
            "token_embedding", nn.initializers.normal(0.02), (VOCAB_SIZE, TEXT_WIDTH)
        )
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.01), (CONTEXT_LENGTH, TEXT_WIDTH)
        )
        x = emb[tokens] + pos[None]
        for i in range(TEXT_LAYERS):
            x = ResidualAttentionBlock(
                TEXT_WIDTH, TEXT_HEADS, causal=True, compute_dtype=cd, name=f"block_{i}"
            )(x)
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=jnp.float32, name="ln_final")(x)
        # Take features at the EOS token (highest token id position).
        eos_idx = jnp.argmax(tokens, axis=-1)
        x = jnp.take_along_axis(x, eos_idx[:, None, None], axis=1)[:, 0]
        proj = self.param(
            "text_projection", nn.initializers.normal(TEXT_WIDTH**-0.5), (TEXT_WIDTH, EMBED_DIM)
        )
        return (x.astype(jnp.float32) @ proj).astype(jnp.float32)


# CLIP preprocessing constants (OpenAI).
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def preprocess_for_clip(images_m11: jax.Array) -> jax.Array:
    """[-1,1] images [B,H,W,3] -> CLIP-normalized 224x224 (ref :90-94)."""
    x = jnp.clip(images_m11, -1.0, 1.0)
    B = x.shape[0]
    if x.shape[1] != IMAGE_RESOLUTION:
        x = jax.image.resize(
            x, (B, IMAGE_RESOLUTION, IMAGE_RESOLUTION, 3), method="bilinear"
        )
    x01 = (x + 1.0) * 0.5
    return (x01 - CLIP_MEAN) / CLIP_STD


def tokenize(texts, context_length: int = CONTEXT_LENGTH) -> np.ndarray:
    """Prompt(s) -> [N, 77] CLIP token ids (contract of clip.tokenize,
    ref t2i_moe_gan.py:49-64).

    Resolution order:
    1. the vendored dependency-free BPE (models/bpe.py) whenever a merges
       file is on disk (CLIP_BPE_PATH / bpe_simple_vocab_16e6.txt[.gz]) —
       exact OpenAI CLIP ids;
    2. transformers' CLIPTokenizer if its vocab is cached locally;
    3. a deterministic byte-level fallback into the same id space with
       BOS=49406 / EOS=49407 framing (keeps prompt->image paths runnable
       and testable without any vocab on disk).
    """
    if isinstance(texts, str):
        texts = [texts]

    from moegan_tpu.models.bpe import default_tokenizer

    bpe = default_tokenizer()
    if bpe is not None and bpe.vocab_size == VOCAB_SIZE:
        return bpe.tokenize(list(texts), context_length)

    try:  # transformers tokenizer if its vocab files exist locally
        from transformers import CLIPTokenizer

        tok = CLIPTokenizer.from_pretrained(
            os.environ.get("CLIP_TOKENIZER_PATH", "openai/clip-vit-base-patch32"),
            local_files_only=True,
        )
        enc = tok(
            list(texts), padding="max_length", truncation=True,
            max_length=context_length, return_tensors="np",
        )
        return enc["input_ids"].astype(np.int32)
    except Exception:
        pass

    out = np.zeros((len(texts), context_length), np.int32)
    for i, t in enumerate(texts):
        ids = [49406] + [b + 256 for b in t.encode("utf-8")][: context_length - 2] + [49407]
        out[i, : len(ids)] = ids
    return out


def init_clip_params(seed: int = 0):
    """Deterministic random-weight CLIP (no pretrained weights on disk)."""
    img = CLIPImageTower()
    txt = CLIPTextTower()
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    dummy_img = jnp.zeros((1, IMAGE_RESOLUTION, IMAGE_RESOLUTION, 3), jnp.float32)
    dummy_tok = jnp.zeros((1, CONTEXT_LENGTH), jnp.int32)
    return {
        "image": img.init(k1, dummy_img)["params"],
        "text": txt.init(k2, dummy_tok)["params"],
    }


def params_from_flat(flat) -> dict:
    """{'tower/module/param': array} (scripts/convert_clip.py output) ->
    nested params pytree for the towers."""
    import flax.traverse_util as tu

    return tu.unflatten_dict(
        {tuple(k.split("/")): jnp.asarray(v) for k, v in flat.items()}
    )


def load_clip_params(path: Optional[str] = None, seed: int = 0):
    """Load converted CLIP params from ``path`` (.npz of flattened arrays
    produced by scripts/convert_clip.py) or fall back to random init."""
    path = path or os.environ.get(CLIP_WEIGHTS_ENV)
    if path and os.path.exists(path):
        return params_from_flat(dict(np.load(path)))
    return init_clip_params(seed)


def image_features_preprocessed(params, x: jax.Array) -> jax.Array:
    """Image tower on already CLIP-normalized 224x224 NHWC input."""
    return CLIPImageTower().apply({"params": params["image"]}, x)


def image_features(params, images_m11: jax.Array) -> jax.Array:
    """CLIP image embeddings for [-1,1] images (any square resolution)."""
    return image_features_preprocessed(params, preprocess_for_clip(images_m11))


def text_features(params, tokens: jax.Array) -> jax.Array:
    return CLIPTextTower().apply({"params": params["text"]}, tokens)


def encode_text(params, texts) -> jax.Array:
    """Prompt(s) -> [N, 512] embeddings (mirror of encode_text_with_clip,
    ref t2i_moe_gan.py:49-64)."""
    toks = jnp.asarray(tokenize(texts))
    return text_features(params, toks)
