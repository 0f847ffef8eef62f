"""JAX CLIP towers: shapes, preprocessing parity, tokenizer contract,
clip loss stop-gradient semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moegan_tpu.models import clip_jax


@pytest.fixture(scope="module")
def clip_params():
    return clip_jax.init_clip_params(seed=0)


def test_preprocess_for_clip():
    img = jnp.zeros((2, 16, 16, 3))  # mid-gray in [-1,1] space -> 0.5 in [0,1]
    out = clip_jax.preprocess_for_clip(img)
    assert out.shape == (2, 224, 224, 3)
    want = (0.5 - clip_jax.CLIP_MEAN) / clip_jax.CLIP_STD
    np.testing.assert_allclose(np.asarray(out[0, 0, 0]), want, rtol=1e-5)


def test_tokenize_contract():
    toks = clip_jax.tokenize(["hello world", "x"])
    assert toks.shape == (2, 77)
    assert toks[0, 0] == 49406  # BOS
    assert 49407 in toks[0]  # EOS present
    assert toks[1, 3] == 0  # padded
    # deterministic
    np.testing.assert_array_equal(toks, clip_jax.tokenize(["hello world", "x"]))


def test_image_tower_shapes(clip_params):
    imgs = jnp.zeros((2, 64, 64, 3))
    feats = clip_jax.image_features(clip_params, imgs)
    assert feats.shape == (2, 512)
    assert np.isfinite(np.asarray(feats)).all()


def test_text_tower_and_encode(clip_params):
    emb = clip_jax.encode_text(clip_params, ["a cat", "a dog"])
    assert emb.shape == (2, 512)
    # different prompts -> different embeddings even with random weights
    assert not np.allclose(np.asarray(emb[0]), np.asarray(emb[1]))


def test_clip_loss_stop_gradient(clip_params):
    from moegan_tpu.losses.clip_loss import clip_loss

    imgs = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    text = jax.random.normal(jax.random.PRNGKey(1), (2, 512))

    # parity mode: no gradient reaches the images (ref :99-101 no_grad)
    g_stop = jax.grad(lambda im: clip_loss(clip_params, im, text, stop_gradient=True))(imgs)
    assert float(jnp.abs(g_stop).sum()) == 0.0
    # fixed mode: gradient flows
    g_flow = jax.grad(lambda im: clip_loss(clip_params, im, text, stop_gradient=False))(imgs)
    assert float(jnp.abs(g_flow).sum()) > 0.0


def test_clip_score_range(clip_params):
    from moegan_tpu.losses.clip_loss import clip_score

    imgs = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    text = jax.random.normal(jax.random.PRNGKey(1), (2, 512))
    s = float(clip_score(clip_params, imgs, text))
    assert 0.0 <= s <= 100.0


def test_multi_level_clip_loss_matches_per_tap(clip_params):
    """The single batched ViT pass must reproduce per-tap clip_loss values
    (identical per-sample math, just concatenated on batch)."""
    from moegan_tpu.losses.clip_loss import clip_loss, multi_level_clip_loss

    k = jax.random.PRNGKey(3)
    taps = {
        8: jnp.tanh(jax.random.normal(k, (2, 8, 8, 3))),
        16: jnp.tanh(jax.random.normal(jax.random.fold_in(k, 1), (2, 16, 16, 3))),
    }
    text = jax.random.normal(jax.random.fold_in(k, 2), (2, 512))

    batched = multi_level_clip_loss(clip_params, taps, text, stop_gradient=True)
    assert set(batched) == {8, 16}
    for r, imgs in taps.items():
        want = clip_loss(clip_params, imgs, text, stop_gradient=True)
        np.testing.assert_allclose(
            float(batched[r]), float(want), rtol=2e-3, atol=2e-4, err_msg=str(r)
        )

    # gradient-carrying variant flows to every tap
    def total(t):
        losses = multi_level_clip_loss(clip_params, t, text, stop_gradient=False)
        return sum(losses.values())

    grads = jax.grad(total)(taps)
    for r, g in grads.items():
        assert float(jnp.abs(g).sum()) > 0.0, r
