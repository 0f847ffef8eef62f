"""From-scratch toy text/image embedding pair (the offline CLIP stand-in).

The reference conditions generation on CLIP ViT-B/32 embeddings and a CLIP
perceptual loss (t2i_moe_gan.py:32-119); this environment has no pretrained
weights (zero egress), so the *semantic* conditioning path could never be
demonstrated — the full JAX ViT towers (models/clip_jax.py) run random-init.
This module closes that gap without external weights: a small contrastive
text/image embedder, trainable from scratch in minutes on the procedural
colored-shapes corpus (data/datasets.py:shapes_dataset), emitting 512-dim
embeddings compatible with everything that consumes CLIP embeddings
(config.TEXT_EMBEDDING_DIM contract: router text tower, discriminator text
projection, CLIP loss, CLIPScore).

Integration contract: a params pytree of the form ``{"toy": {...}}`` is
recognized by losses/clip_loss.py and infer.Sampler as a drop-in tower pack
— the dispatch is structural (pytree keys), so it traces cleanly under jit.

Towers (everything fp32 — the model is tiny):
- image: 3 stride-2 convs (32/64/128ch, GELU) -> flatten -> Dense(512)
- text:  word embedding (mean-pooled bag of words over a fixed template
         vocabulary) -> 2-layer MLP -> 512
- loss:  symmetric InfoNCE with learnable logit scale (CLIP's objective).
"""

from __future__ import annotations

from typing import Iterable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

EMBED_DIM = 512
MAX_WORDS = 12

# Fixed vocabulary: every word the caption templates can emit
# (data/datasets.py SHAPE_COLORS/SHAPE_KINDS/_CAPTION_TEMPLATES), plus
# <pad>=0 and <unk>=1 so arbitrary prompts still tokenize.
_WORDS = (
    "a", "the", "one", "on", "in", "dark", "background", "picture",
    "red", "green", "blue", "yellow", "magenta", "cyan", "orange", "white",
    "circle", "square", "triangle", "cross",
)
VOCAB = {w: i + 2 for i, w in enumerate(_WORDS)}
VOCAB_SIZE = len(VOCAB) + 2


def tokenize(texts, max_words: int = MAX_WORDS) -> np.ndarray:
    """Captions -> [N, max_words] int32 ids (0 = pad, 1 = unk)."""
    if isinstance(texts, str):
        texts = [texts]
    out = np.zeros((len(texts), max_words), np.int32)
    for i, t in enumerate(texts):
        words = str(t).lower().replace(".", " ").replace(",", " ").split()
        for j, w in enumerate(words[:max_words]):
            out[i, j] = VOCAB.get(w, 1)
    return out


class ToyImageTower(nn.Module):
    """[-1,1] NHWC images at native resolution -> [B, 512]."""

    @nn.compact
    def __call__(self, x):
        for i, ch in enumerate((32, 64, 128)):
            x = nn.Conv(ch, (3, 3), strides=(2, 2), name=f"conv_{i}")(x)
            x = nn.gelu(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.gelu(nn.Dense(256, name="fc")(x))
        return nn.Dense(EMBED_DIM, name="head")(x)


class ToyTextTower(nn.Module):
    """Token ids [B, T] -> [B, 512] (mean-pooled bag of words + MLP)."""

    @nn.compact
    def __call__(self, tokens):
        emb = self.param(
            "token_embedding", nn.initializers.normal(0.02), (VOCAB_SIZE, 64)
        )
        x = emb[tokens]  # [B, T, 64]
        mask = (tokens > 0).astype(jnp.float32)[..., None]
        x = (x * mask).sum(1) / jnp.maximum(mask.sum(1), 1.0)
        x = nn.gelu(nn.Dense(256, name="fc")(x))
        return nn.Dense(EMBED_DIM, name="head")(x)


def native_resolution(toy_params) -> int:
    """Infer the image tower's training resolution from its fc kernel:
    in_features = 128 * (R/8)^2 after three stride-2 convs."""
    in_feat = toy_params["image"]["fc"]["kernel"].shape[0]
    return int(8 * round(float(np.sqrt(in_feat / 128.0))))


def preprocess(toy_params, images_m11: jax.Array) -> jax.Array:
    """[-1,1] images [B,H,W,3] -> the tower's native resolution (the toy
    analog of clip_jax.preprocess_for_clip's 224 resize)."""
    x = jnp.clip(images_m11, -1.0, 1.0)
    res = native_resolution(toy_params)
    if x.shape[1] != res:
        x = jax.image.resize(x, (x.shape[0], res, res, 3), method="bilinear")
    return x


def image_features_preprocessed(toy_params, x: jax.Array) -> jax.Array:
    return ToyImageTower().apply({"params": toy_params["image"]}, x)


def image_features(toy_params, images_m11: jax.Array) -> jax.Array:
    return image_features_preprocessed(toy_params, preprocess(toy_params, images_m11))


def text_features(toy_params, tokens: jax.Array) -> jax.Array:
    return ToyTextTower().apply({"params": toy_params["text"]}, tokens)


def encode_text(toy_params, texts) -> jax.Array:
    """Prompt(s) -> [N, 512] L2-normalized embeddings (matching CLIP's
    unit-norm convention so cosine machinery behaves identically)."""
    feats = text_features(toy_params, jnp.asarray(tokenize(texts)))
    return feats / (jnp.linalg.norm(feats, axis=-1, keepdims=True) + 1e-8)


def init_toy_params(resolution: int = 16, seed: int = 0) -> dict:
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    img = ToyImageTower().init(k1, jnp.zeros((1, resolution, resolution, 3)))
    txt = ToyTextTower().init(k2, jnp.zeros((1, MAX_WORDS), jnp.int32))
    return {
        "image": img["params"],
        "text": txt["params"],
        "logit_scale": jnp.asarray(np.log(1 / 0.07), jnp.float32),  # CLIP init
    }


def as_tower_pack(toy_params: dict) -> dict:
    """Wrap trained toy params into the structural-dispatch form the CLIP
    loss / Sampler recognize ({"toy": ...})."""
    return {"toy": toy_params}


def train_toy_clip(
    images_m11: np.ndarray,
    captions: Sequence[str],
    *,
    steps: int = 1200,
    batch_size: int = 256,
    lr: float = 1e-3,
    seed: int = 0,
    log_every: int = 200,
    log=print,
) -> dict:
    """Contrastive (symmetric InfoNCE) training of both towers from scratch.

    Same objective CLIP itself trains with; on the shapes corpus this
    reaches >99% class retrieval in ~1k steps on CPU.
    """
    import optax

    images = np.asarray(images_m11, np.float32)
    tokens = tokenize(list(captions))
    params = init_toy_params(resolution=images.shape[1], seed=seed)
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, img_b, tok_b):
        def loss_fn(p):
            fi = image_features_preprocessed(p, img_b)
            ft = text_features(p, tok_b)
            fi = fi / (jnp.linalg.norm(fi, axis=-1, keepdims=True) + 1e-8)
            ft = ft / (jnp.linalg.norm(ft, axis=-1, keepdims=True) + 1e-8)
            scale = jnp.exp(jnp.clip(p["logit_scale"], -2.0, np.log(100.0)))
            logits = scale * fi @ ft.T
            labels = jnp.arange(logits.shape[0])
            li = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
            lt = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
            return 0.5 * (li.mean() + lt.mean())

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    n = len(images)
    for i in range(steps):
        idx = rng.choice(n, size=min(batch_size, n), replace=False)
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(images[idx]), jnp.asarray(tokens[idx])
        )
        if log_every and (i + 1) % log_every == 0:
            log(f"[toy_clip] step {i + 1}/{steps} infonce={float(loss):.4f}")
    return jax.device_get(params)


def retrieval_accuracy(
    toy_params: dict,
    images_m11: np.ndarray,
    labels: np.ndarray,
    class_captions: Iterable[str],
    batch_size: int = 512,
) -> float:
    """Fraction of images whose nearest class-caption embedding is their
    true (color, shape) class — the semantic health check."""
    ft = np.asarray(encode_text(toy_params, list(class_captions)))
    correct = 0
    images = np.asarray(images_m11, np.float32)
    for s in range(0, len(images), batch_size):
        fi = np.asarray(image_features(toy_params, jnp.asarray(images[s : s + batch_size])))
        fi = fi / (np.linalg.norm(fi, axis=-1, keepdims=True) + 1e-8)
        pred = (fi @ ft.T).argmax(-1)
        correct += int((pred == labels[s : s + batch_size]).sum())
    return correct / len(images)


def save_toy_params(path: str, toy_params: dict) -> None:
    import flax.traverse_util as tu

    flat = {
        "/".join(k): np.asarray(v)
        for k, v in tu.flatten_dict(toy_params).items()
    }
    np.savez(path, **flat)


def load_toy_params(path: str) -> dict:
    import flax.traverse_util as tu

    flat = dict(np.load(path))
    return tu.unflatten_dict(
        {tuple(k.split("/")): jnp.asarray(v) for k, v in flat.items()}
    )
