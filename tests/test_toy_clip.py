"""Tests for the from-scratch toy embedder (models/toy_clip.py) and the
colored-shapes corpus (data/datasets.py:shapes_dataset) — the offline
stand-in proving the semantic conditioning path (reference
t2i_moe_gan.py:66-119) without pretrained weights."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moegan_tpu.data.datasets import (
    SHAPE_COLORS,
    SHAPE_KINDS,
    shape_class_names,
    shapes_dataset,
)
from moegan_tpu.models import toy_clip


def test_shapes_dataset_contract():
    ds, labels = shapes_dataset(64, resolution=16, seed=3)
    assert ds.images.shape == (64, 16, 16, 3)
    assert ds.images.min() >= -1.0 and ds.images.max() <= 1.0
    assert labels.shape == (64,)
    assert labels.max() < len(SHAPE_COLORS) * len(SHAPE_KINDS)
    # Caption words match the label's (color, shape).
    names = shape_class_names()
    for i in range(8):
        color, shape = names[labels[i]].split()[-2:]
        assert color in ds.captions[i] and shape in ds.captions[i]
    # Determinism.
    ds2, labels2 = shapes_dataset(64, resolution=16, seed=3)
    np.testing.assert_array_equal(ds.images, ds2.images)
    np.testing.assert_array_equal(labels, labels2)


def test_tokenize_covers_templates():
    ds, _ = shapes_dataset(32, seed=0)
    toks = toy_clip.tokenize(list(ds.captions))
    assert toks.shape == (32, toy_clip.MAX_WORDS)
    assert (toks != 1).all(), "template captions must not hit <unk>"
    assert toy_clip.tokenize("qwerty zzz")[0, 0] == 1  # unknown words -> unk


def test_toy_clip_learns_retrieval():
    ds, labels = shapes_dataset(1024, resolution=16, seed=0)
    params = toy_clip.train_toy_clip(
        ds.images, ds.captions, steps=600, batch_size=256, seed=0, log_every=0
    )
    val, val_labels = shapes_dataset(256, resolution=16, seed=99)
    acc = toy_clip.retrieval_accuracy(
        params, val.images, val_labels, shape_class_names()
    )
    assert acc > 0.85, f"retrieval accuracy {acc} too low — embedder not semantic"


def test_toy_params_roundtrip(tmp_path):
    params = toy_clip.init_toy_params(resolution=16, seed=1)
    path = str(tmp_path / "toy.npz")
    toy_clip.save_toy_params(path, params)
    loaded = toy_clip.load_toy_params(path)
    assert toy_clip.native_resolution(loaded) == 16
    x = jnp.zeros((2, 16, 16, 3))
    np.testing.assert_allclose(
        np.asarray(toy_clip.image_features(params, x)),
        np.asarray(toy_clip.image_features(loaded, x)),
        rtol=1e-6,
    )


def test_clip_loss_dispatch_and_gradient():
    """The {"toy": ...} pack routes through multi_level_clip_loss and,
    with stop_gradient=False, carries gradient to the images."""
    from moegan_tpu.losses.clip_loss import clip_score, multi_level_clip_loss

    pack = toy_clip.as_tower_pack(toy_clip.init_toy_params(resolution=16, seed=0))
    imgs = {
        16: jax.random.uniform(jax.random.PRNGKey(0), (4, 16, 16, 3), minval=-1),
        8: jax.random.uniform(jax.random.PRNGKey(1), (4, 8, 8, 3), minval=-1),
    }
    text = jax.random.normal(jax.random.PRNGKey(2), (4, 512))

    losses = multi_level_clip_loss(pack, imgs, text, stop_gradient=False)
    assert set(losses) == {8, 16}
    for v in losses.values():
        assert np.isfinite(float(v))

    g = jax.grad(
        lambda x: multi_level_clip_loss(pack, {16: x}, text, stop_gradient=False)[16]
    )(imgs[16])
    assert float(jnp.abs(g).max()) > 0.0

    g0 = jax.grad(
        lambda x: multi_level_clip_loss(pack, {16: x}, text, stop_gradient=True)[16]
    )(imgs[16])
    assert float(jnp.abs(g0).max()) == 0.0

    s = clip_score(pack, imgs[16], text)
    assert np.isfinite(float(s))


def test_train_step_accepts_toy_pack():
    """One jitted G+D step with the toy pack as clip_params (the
    conditioning-demo training configuration, clip_stop_gradient=False)."""
    from moegan_tpu.config import (
        DiscriminatorConfig,
        GeneratorConfig,
        LossConfig,
        TrainConfig,
    )
    from moegan_tpu.train.state import create_train_state
    from moegan_tpu.train.step import make_train_step

    cfg = TrainConfig(
        batch_size=4,
        generator=GeneratorConfig(
            max_resolution=8, channels={4: 32, 8: 16}, router_hidden=16,
            use_pallas=False,
        ),
        discriminator=DiscriminatorConfig(max_resolution=8, base_channels=8),
        loss=LossConfig(
            clip_weights={8: 0.1}, clip_stop_gradient=False
        ),
    )
    pack = toy_clip.as_tower_pack(toy_clip.init_toy_params(resolution=16, seed=0))
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step_fn, _ = make_train_step(cfg, steps_per_epoch=2, with_clip=True)
    batch = {
        "image": jnp.zeros((4, 8, 8, 3)),
        "text": jnp.ones((4, 512)) * 0.1,
    }
    schedule = {
        "temperature_factor": jnp.float32(1.0),
        "effective_kl_weight": jnp.float32(1e-4),
    }
    new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(1), schedule, pack)
    assert np.isfinite(float(metrics["g_total"]))
    assert "clip_loss_8" in metrics and np.isfinite(float(metrics["clip_loss_8"]))


def test_sampler_encodes_toy_prompts():
    from moegan_tpu.config import GeneratorConfig
    from moegan_tpu.infer.sample import Sampler
    from moegan_tpu.models.generator import AuroraGenerator

    cfg = GeneratorConfig(
        max_resolution=8, channels={4: 32, 8: 16}, router_hidden=16,
        use_pallas=False,
    )
    gen = AuroraGenerator(cfg)
    params = gen.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.latent_dim)),
        jnp.zeros((1, 512)),
        training=False,
    )["params"]
    pack = toy_clip.as_tower_pack(toy_clip.init_toy_params(resolution=16, seed=0))
    sampler = Sampler(cfg, params, clip_params=pack)
    imgs = sampler("a red circle", num_samples=2)
    assert imgs.shape == (2, 8, 8, 3)
