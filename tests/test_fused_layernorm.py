"""fused_layer_norm vs flax.linen.LayerNorm(dtype=f32): forward and
gradient parity. On CPU the public op falls back to XLA; the Pallas
forward/backward kernels are exercised in interpret mode."""

from unittest import mock

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moegan_tpu.ops import fused_layernorm as fln

EPS = 1e-5


@pytest.fixture(scope="module")
def data():
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (4, 64, 32)).astype(jnp.bfloat16)
    scale = jax.random.normal(jax.random.fold_in(k, 1), (32,)) * 0.1 + 1.0
    bias = jax.random.normal(jax.random.fold_in(k, 2), (32,)) * 0.1
    return x, scale, bias


def _flax_ln(x, scale, bias):
    mod = nn.LayerNorm(epsilon=EPS, dtype=jnp.float32)
    y = mod.apply({"params": {"scale": scale, "bias": bias}}, x)
    return y.astype(x.dtype)  # consumer-side bf16 cast, as in the blocks


def test_fallback_matches_flax(data):
    x, scale, bias = data
    got = fln.fused_layer_norm(x, scale, bias, EPS)
    want = _flax_ln(x, scale, bias)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=2e-2
    )


def _interpreted():
    real = fln.pl.pallas_call

    def fake(*a, **kw):
        kw["interpret"] = True
        return real(*a, **kw)

    return mock.patch.object(fln.pl, "pallas_call", fake)


def test_kernel_forward_interpret(data):
    x, scale, bias = data
    with _interpreted(), mock.patch.object(fln, "_supported", lambda *a: True):
        got = fln.fused_layer_norm(x, scale, bias, EPS)
    want = _flax_ln(x, scale, bias)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=2e-2
    )


def test_kernel_backward_interpret(data):
    x, scale, bias = data

    def loss_fused(x, s, b):
        return jnp.sum(fln.fused_layer_norm(x, s, b, EPS).astype(jnp.float32) ** 2)

    def loss_flax(x, s, b):
        return jnp.sum(_flax_ln(x, s, b).astype(jnp.float32) ** 2)

    with _interpreted(), mock.patch.object(fln, "_supported", lambda *a: True):
        g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(loss_flax, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_, name in zip(g1, g2, ("dx", "dscale", "dbias")):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b_, np.float32),
            rtol=5e-2, atol=5e-2, err_msg=name,
        )


def test_odd_leading_shape_falls_back(data):
    _, scale, bias = data
    x = jax.random.normal(jax.random.PRNGKey(9), (3, 5, 32)).astype(jnp.bfloat16)
    got = fln.fused_layer_norm(x, scale, bias, EPS)
    want = _flax_ln(x, scale, bias)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=2e-2
    )
