"""upsample2x_bilinear must equal jax.image.resize bilinear (the
reference's F.interpolate(scale_factor=2, mode="bilinear"),
t2i_moe_gan.py:176-178,634-640) — bit-exact in bf16, float-tolerance in
f32 — including the MOEGAN_FAST_UPSAMPLE=0 fallback."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moegan_tpu.core.upsample import upsample2x_bilinear


@pytest.mark.parametrize("shape", [(2, 4, 4, 3), (1, 8, 6, 5), (2, 5, 7, 4)])
def test_two_tap_matches_jax_image_resize_f32(shape, monkeypatch):
    monkeypatch.setenv("MOEGAN_FAST_UPSAMPLE", "1")
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
    b, h, w, c = shape
    want = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="bilinear")
    np.testing.assert_allclose(
        np.asarray(upsample2x_bilinear(x)), np.asarray(want), atol=1e-6
    )


def test_two_tap_bf16_bitexact(monkeypatch):
    monkeypatch.setenv("MOEGAN_FAST_UPSAMPLE", "1")
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4)).astype(jnp.bfloat16)
    want = jax.image.resize(x, (2, 16, 16, 4), method="bilinear")
    got = upsample2x_bilinear(x)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(want, np.float32)
    )


def test_default_is_resize(monkeypatch):
    monkeypatch.delenv("MOEGAN_FAST_UPSAMPLE", raising=False)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 4, 2), jnp.float32)
    want = jax.image.resize(x, (1, 8, 8, 2), method="bilinear")
    np.testing.assert_allclose(
        np.asarray(upsample2x_bilinear(x)), np.asarray(want), atol=1e-6
    )
