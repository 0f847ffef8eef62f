"""Baseline text-conditional DCGAN (the reference's pre-MoE sanity model).

Reference: gan_model/base_gan_model.py — Generator: ConvTranspose stack
from [z(100) || text_proj(128)] to 64x64 with BatchNorm+ReLU and Tanh
output (:62-113); Discriminator: strided conv stack with text concat at
4x4 and Sigmoid output for the BCE regime (:116-171); classic alternating
training with BCELoss + Adam(2e-4, beta1=0.5) (:246-387); prompt->grid
generation (:192-243). Rebuilt as jitted JAX with the same topology.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

Z_DIM = 100  # ref :20-ish constants
TEXT_PROJ = 128


class DCGANGenerator(nn.Module):
    base_features: int = 64
    text_dim: int = 512

    @nn.compact
    def __call__(self, z, text_emb, training: bool = True):
        f = self.base_features
        t = nn.relu(nn.Dense(TEXT_PROJ, name="text_proj")(text_emb))
        x = jnp.concatenate([z, t], axis=-1)[:, None, None, :]  # [B,1,1,228]

        def up(x, feats, name):
            x = nn.ConvTranspose(
                feats, (4, 4), strides=(2, 2), padding="SAME", use_bias=False,
                name=f"convt_{name}",
            )(x)
            x = nn.BatchNorm(
                use_running_average=not training, name=f"bn_{name}"
            )(x)
            return nn.relu(x)

        # 1x1 -> 4x4
        x = nn.ConvTranspose(f * 8, (4, 4), strides=(4, 4), use_bias=False, name="convt_in")(x)
        x = nn.BatchNorm(use_running_average=not training, name="bn_in")(x)
        x = nn.relu(x)
        x = up(x, f * 4, "8")    # 8x8
        x = up(x, f * 2, "16")   # 16x16
        x = up(x, f, "32")       # 32x32
        x = nn.ConvTranspose(3, (4, 4), strides=(2, 2), padding="SAME", name="convt_out")(x)
        return jnp.tanh(x)  # 64x64 in [-1,1]


class DCGANDiscriminator(nn.Module):
    base_features: int = 64
    text_dim: int = 512

    @nn.compact
    def __call__(self, img, text_emb):
        f = self.base_features

        def down(x, feats, name, norm=True):
            x = nn.Conv(feats, (4, 4), strides=(2, 2), padding="SAME", use_bias=False,
                        name=f"conv_{name}")(x)
            if norm:
                x = nn.GroupNorm(num_groups=8, name=f"gn_{name}")(x)
            return nn.leaky_relu(x, 0.2)

        x = down(img, f, "32", norm=False)  # 32
        x = down(x, f * 2, "16")            # 16
        x = down(x, f * 4, "8")             # 8
        x = down(x, f * 8, "4")             # 4
        t = nn.leaky_relu(nn.Dense(TEXT_PROJ, name="text_proj")(text_emb), 0.2)
        tmap = jnp.broadcast_to(t[:, None, None, :], (x.shape[0], 4, 4, TEXT_PROJ))
        x = jnp.concatenate([x, tmap], axis=-1)
        x = nn.Conv(1, (4, 4), padding="VALID", name="conv_out")(x)
        # Sigmoid output (BCE regime, ref :168) — returned as probability.
        return jax.nn.sigmoid(x.reshape(img.shape[0]))


class DCGANState(NamedTuple):
    g_params: dict
    g_batch_stats: dict
    d_params: dict
    g_opt: object
    d_opt: object
    step: jax.Array


def create_dcgan_state(rng, text_dim: int = 512, lr: float = 2e-4):
    gen, disc = DCGANGenerator(text_dim=text_dim), DCGANDiscriminator(text_dim=text_dim)
    kg, kd = jax.random.split(rng)
    z = jnp.zeros((1, Z_DIM))
    t = jnp.zeros((1, text_dim))
    gv = gen.init(kg, z, t, training=False)
    dv = disc.init(kd, jnp.zeros((1, 64, 64, 3)), t)
    tx = optax.adam(lr, b1=0.5)  # ref Adam(2e-4, beta1=0.5)
    return (
        gen, disc, tx,
        DCGANState(
            gv["params"], gv.get("batch_stats", {}), dv["params"],
            tx.init(gv["params"]), tx.init(dv["params"]), jnp.zeros((), jnp.int32),
        ),
    )


def make_dcgan_train_step(gen, disc, tx):
    """Classic BCE alternation (ref train_with_limited_resources :246-387)."""

    def bce(p, y):
        p = jnp.clip(p, 1e-7, 1 - 1e-7)
        return -jnp.mean(y * jnp.log(p) + (1 - y) * jnp.log(1 - p))

    @jax.jit
    def step(state: DCGANState, batch, rng):
        real, text = batch["image"], batch["text"]
        B = real.shape[0]
        kz, _ = jax.random.split(rng)
        z = jax.random.normal(kz, (B, Z_DIM))

        def d_loss_fn(d_params):
            fake, _ = gen.apply(
                {"params": state.g_params, "batch_stats": state.g_batch_stats},
                z, text, training=True, mutable=["batch_stats"],
            )
            pr = disc.apply({"params": d_params}, real, text)
            pf = disc.apply({"params": d_params}, jax.lax.stop_gradient(fake), text)
            return bce(pr, jnp.ones(B)) + bce(pf, jnp.zeros(B))

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.d_params)
        d_up, d_opt = tx.update(d_grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_up)

        def g_loss_fn(g_params):
            fake, mut = gen.apply(
                {"params": g_params, "batch_stats": state.g_batch_stats},
                z, text, training=True, mutable=["batch_stats"],
            )
            pf = disc.apply({"params": d_params}, fake, text)
            return bce(pf, jnp.ones(B)), mut["batch_stats"]

        (g_loss, bstats), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.g_params
        )
        g_up, g_opt = tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_up)

        new_state = DCGANState(g_params, bstats, d_params, g_opt, d_opt, state.step + 1)
        return new_state, {"d_loss": d_loss, "g_loss": g_loss}

    return step


def train_with_limited_resources(
    dataset, *, epochs: int = 5, batch_size: int = 32, lr: float = 2e-4,
    subset: int | None = None, seed: int = 0, checkpoint_dir: str | None = None,
):
    """Resource-capped training (ref :246-387: subset sampling, per-epoch
    checkpoint saves, loss tracking for plots). Returns (models, state,
    history)."""
    import numpy as np

    from moegan_tpu.data.loader import BatchLoader

    rng = jax.random.PRNGKey(seed)
    gen, disc, tx, state = create_dcgan_state(rng, dataset.text_embeddings.shape[-1], lr)
    step = make_dcgan_train_step(gen, disc, tx)

    if subset and subset < len(dataset):
        from moegan_tpu.data.datasets import ProcessedMSCOCODataset

        dataset = ProcessedMSCOCODataset(
            dataset.images[:subset], dataset.text_embeddings[:subset]
        )
    loader = BatchLoader(dataset, batch_size, seed=seed)
    history = {"d_loss": [], "g_loss": []}
    i = 0
    for epoch in range(epochs):
        for batch in loader.epoch(epoch):
            batch = {"image": jnp.asarray(batch["image"]), "text": jnp.asarray(batch["text"])}
            state, m = step(state, batch, jax.random.fold_in(rng, i))
            i += 1
        history["d_loss"].append(float(m["d_loss"]))
        history["g_loss"].append(float(m["g_loss"]))
        if checkpoint_dir:
            import os

            from moegan_tpu.utils.checkpoint import save_generator_params

            os.makedirs(checkpoint_dir, exist_ok=True)
            save_generator_params(
                os.path.join(checkpoint_dir, f"dcgan_epoch_{epoch + 1}.msgpack"),
                state.g_params,
            )
    return (gen, disc), state, history


def generate_image_from_text(gen, state: DCGANState, text_emb, num_samples: int = 4,
                             seed: int = 0):
    """Prompt embedding -> [-1,1] 64x64 images (ref :192-243)."""
    z = jax.random.normal(jax.random.PRNGKey(seed), (num_samples, Z_DIM))
    text_emb = jnp.asarray(text_emb)
    if text_emb.ndim == 1:
        text_emb = text_emb[None]
    if text_emb.shape[0] == 1:
        text_emb = jnp.broadcast_to(text_emb, (num_samples, text_emb.shape[-1]))
    imgs = gen.apply(
        {"params": state.g_params, "batch_stats": state.g_batch_stats},
        z, text_emb, training=False,
    )
    return jnp.clip(imgs, -1, 1)
