"""Baseline DCGAN sanity model (reference gan_model/base_gan_model.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from moegan_tpu.data.datasets import synthetic_dataset
from moegan_tpu.models.dcgan import (
    create_dcgan_state,
    generate_image_from_text,
    make_dcgan_train_step,
    train_with_limited_resources,
)


def test_dcgan_shapes_and_training():
    ds = synthetic_dataset(16, 64, seed=0)
    models, state, history = train_with_limited_resources(
        ds, epochs=2, batch_size=8, subset=16
    )
    gen, disc = models
    assert len(history["d_loss"]) == 2
    assert all(np.isfinite(v) for v in history["d_loss"] + history["g_loss"])

    emb = ds.text_embeddings[0]
    imgs = generate_image_from_text(gen, state, emb, num_samples=2)
    assert imgs.shape == (2, 64, 64, 3)
    a = np.asarray(imgs)
    assert a.min() >= -1 and a.max() <= 1


def test_dcgan_discriminator_outputs_probabilities():
    rng = jax.random.PRNGKey(0)
    gen, disc, tx, state = create_dcgan_state(rng)
    img = jax.random.normal(rng, (2, 64, 64, 3))
    txt = jax.random.normal(rng, (2, 512))
    p = disc.apply({"params": state.d_params}, img, txt)
    a = np.asarray(p)
    assert a.shape == (2,) and (a > 0).all() and (a < 1).all()  # sigmoid regime
