"""Prototype router training: pseudo-label + KMeans-cluster supervision.

Reference: moe/moe_model.py:541-641 (CE + KL training against random
expert labels — whose `loss.requires_grad = True` bug (:597) detached the
graph; fixed here by construction) and moe/moe_integration.py (KMeans
cluster labels :75-101, CLIP-similarity cluster naming :103-183,
KL-to-uniform balance loss :185-208, supervised training CE + 1e-5*KL +
0.001*balance :212-374 with validation accuracy).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from moegan_tpu.prototype.gating import BayesianMoEGatingNetwork

CLUSTER_THEMES = [
    "landscape", "nature", "mountains", "ocean", "beach",
    "person", "portrait", "people", "crowd", "family",
    "urban", "city", "street", "building", "architecture",
    "animal", "wildlife", "pet", "dog", "cat",
    "food", "meal", "cooking", "kitchen", "dining",
    "abstract", "concept", "idea", "emotion", "feeling",
    "sports", "activity", "game", "playing", "exercise",
    "vehicle", "car", "transportation", "travel", "journey",
    "weather", "sky", "clouds", "rain", "sunset",
    "indoor", "room", "furniture", "home", "interior",
]


def kmeans(embeddings: np.ndarray, n_clusters: int, seed: int = 42, n_init: int = 10,
           max_iter: int = 300):
    """KMeans (sklearn when available — reference parity — else a numpy
    Lloyd's implementation with k-means++ init)."""
    try:
        from sklearn.cluster import KMeans

        km = KMeans(n_clusters=n_clusters, random_state=seed, n_init=n_init)
        labels = km.fit_predict(embeddings)
        return labels, km.cluster_centers_
    except ImportError:
        pass

    rng = np.random.default_rng(seed)
    best_labels, best_centers, best_inertia = None, None, np.inf
    for _ in range(n_init):
        # k-means++ seeding
        centers = [embeddings[rng.integers(len(embeddings))]]
        for _ in range(n_clusters - 1):
            d2 = np.min(
                ((embeddings[:, None] - np.asarray(centers)[None]) ** 2).sum(-1), axis=1
            )
            centers.append(embeddings[rng.choice(len(embeddings), p=d2 / d2.sum())])
        centers = np.asarray(centers)
        for _ in range(max_iter):
            d = ((embeddings[:, None] - centers[None]) ** 2).sum(-1)
            labels = d.argmin(1)
            new_centers = np.stack([
                embeddings[labels == k].mean(0) if (labels == k).any() else centers[k]
                for k in range(n_clusters)
            ])
            if np.allclose(new_centers, centers):
                break
            centers = new_centers
        inertia = float(((embeddings - centers[labels]) ** 2).sum())
        if inertia < best_inertia:
            best_labels, best_centers, best_inertia = labels, centers, inertia
    return best_labels, best_centers


def cluster_text_embeddings(text_embeddings: np.ndarray, n_clusters: int = 5, seed: int = 42):
    """Cluster CLIP text embeddings into expert pseudo-labels (ref :75-101)."""
    labels, centers = kmeans(np.asarray(text_embeddings, np.float32), n_clusters, seed)
    return labels, centers


def analyze_clusters(
    text_embeddings: np.ndarray,
    cluster_labels: np.ndarray,
    clip_params=None,
    captions=None,
    top_k: int = 3,
) -> list[str]:
    """Name each cluster by CLIP similarity of its centroid against a
    50-theme word list (ref :103-183)."""
    n_clusters = int(np.max(cluster_labels)) + 1
    theme_embs = None
    if clip_params is not None:
        from moegan_tpu.models.clip_jax import encode_text

        theme_embs = np.asarray(encode_text(clip_params, CLUSTER_THEMES))
        theme_embs /= np.linalg.norm(theme_embs, axis=-1, keepdims=True) + 1e-8

    descriptions = []
    for c in range(n_clusters):
        idx = np.where(cluster_labels == c)[0]
        desc = f"Cluster {c} ({len(idx)} samples)"
        if theme_embs is not None and len(idx):
            centroid = np.mean(np.asarray(text_embeddings)[idx], axis=0)
            centroid /= np.linalg.norm(centroid) + 1e-8
            sims = theme_embs @ centroid
            top = np.argsort(sims)[::-1][:top_k]
            desc += ": " + ", ".join(CLUSTER_THEMES[t] for t in top)
        elif captions is not None and len(idx):
            desc += ": e.g. " + "; ".join(str(captions[i]) for i in idx[:top_k])
        descriptions.append(desc)
    return descriptions


def balance_loss_uniform(probs: jax.Array) -> jax.Array:
    """KL(mean expert usage || uniform) (ref moe_integration.py:185-208)."""
    usage = jnp.mean(probs, axis=0)
    n = probs.shape[-1]
    return jnp.sum(usage * (jnp.log(usage + 1e-10) - jnp.log(1.0 / n)))


def train_moe_with_clusters(
    text_embeddings,
    cluster_labels: Optional[np.ndarray] = None,
    *,
    hidden_dim: int = 256,
    num_experts: Optional[int] = None,
    epochs: int = 10,
    batch_size: int = 64,
    lr: float = 1e-3,
    kl_weight: float = 1e-5,  # ref :249
    balance_weight: float = 0.001,  # ref :286
    val_fraction: float = 0.2,
    seed: int = 0,
):
    """Supervised router training against cluster labels.

    Accepts either (text_embeddings, cluster_labels) arrays or a single
    EnhancedMSCOCODataset (the cluster-labeled container, reference
    moe_integration.py:32-73). Returns (gating, params, history) where
    history has per-epoch train loss and val accuracy (the reference's
    quality gate, :341-344).
    """
    if cluster_labels is None and hasattr(text_embeddings, "cluster_labels"):
        ds = text_embeddings
        text_embeddings, cluster_labels = ds.text_embeddings, ds.cluster_labels
    if cluster_labels is None:
        raise ValueError("need cluster_labels or an EnhancedMSCOCODataset")
    emb = np.asarray(text_embeddings, np.float32)
    labels = np.asarray(cluster_labels, np.int32)
    num_experts = num_experts or int(labels.max()) + 1

    n_val = max(1, int(len(emb) * val_fraction))
    val_emb, val_lab = emb[:n_val], labels[:n_val]
    tr_emb, tr_lab = emb[n_val:], labels[n_val:]

    gating = BayesianMoEGatingNetwork(hidden_dim=hidden_dim, num_experts=num_experts)
    key = jax.random.PRNGKey(seed)
    params = gating.init({"params": key, "router": key}, jnp.zeros((1, emb.shape[-1])))
    tx = optax.adamw(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, y, rng):
        def loss_fn(p):
            probs, kl, logits = gating.apply(p, x, sample=True, rngs={"router": rng})
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()
            bal = balance_loss_uniform(probs)
            return ce + kl_weight * kl + balance_weight * bal, ce

        (loss, ce), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def accuracy(params, x, y):
        _, _, logits = gating.apply(params, x, sample=False)
        return jnp.mean((jnp.argmax(logits, -1) == y).astype(jnp.float32))

    rng_np = np.random.default_rng(seed)
    history = {"train_loss": [], "val_accuracy": []}
    n_batches = max(1, len(tr_emb) // batch_size)
    for epoch in range(epochs):
        order = rng_np.permutation(len(tr_emb))
        losses = []
        for b in range(n_batches):
            idx = order[b * batch_size : (b + 1) * batch_size]
            key, sub = jax.random.split(key)
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(tr_emb[idx]), jnp.asarray(tr_lab[idx]), sub
            )
            losses.append(float(loss))
        acc = float(accuracy(params, jnp.asarray(val_emb), jnp.asarray(val_lab)))
        history["train_loss"].append(float(np.mean(losses)))
        history["val_accuracy"].append(acc)
    return gating, params, history


def train_bayesian_moe_gating(
    text_embeddings: np.ndarray,
    *,
    num_experts: int = 4,
    hidden_dim: int = 128,
    epochs: int = 5,
    seed: int = 0,
    **kw,
):
    """Pseudo-label trainer (ref moe_model.py:541-641): random expert
    labels as a sanity/bring-up run. The reference's detached-loss bug
    (loss.requires_grad = True, :597) doesn't exist here — jax.grad
    differentiates the real loss."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, num_experts, size=len(text_embeddings))
    return train_moe_with_clusters(
        text_embeddings, labels, num_experts=num_experts, hidden_dim=hidden_dim,
        epochs=epochs, seed=seed, **kw,
    )
