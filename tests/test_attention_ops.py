"""chunked/flash attention vs naive attention: numerical parity (forward
and gradients). On CPU flash_attention falls back to the chunked path; the
Pallas kernel itself is exercised in interpret mode."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moegan_tpu.ops.chunked_attention import chunked_attention
from moegan_tpu.ops.flash_attention import _flash_fwd_kernel, flash_attention


def naive(q, k, v):
    d = q.shape[-1]
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(jnp.asarray(d, jnp.float32))
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


@pytest.fixture(scope="module")
def qkv():
    k = jax.random.PRNGKey(0)
    shape = (2, 128, 2, 16)
    q = jax.random.normal(k, shape)
    kk = jax.random.normal(jax.random.fold_in(k, 1), shape)
    v = jax.random.normal(jax.random.fold_in(k, 2), shape)
    return q, kk, v


def test_chunked_matches_naive(qkv):
    q, k, v = qkv
    got = chunked_attention(q, k, v, block_q=32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(naive(q, k, v)), rtol=2e-5, atol=2e-5)


def test_chunked_gradients_match_naive(qkv):
    q, k, v = qkv
    f1 = lambda q, k, v: jnp.sum(chunked_attention(q, k, v, block_q=32) ** 2)
    f2 = lambda q, k, v: jnp.sum(naive(q, k, v) ** 2)
    g1 = jax.grad(f1, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f2, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-5)


def test_flash_falls_back_and_matches(qkv):
    q, k, v = qkv
    got = flash_attention(q, k, v)  # CPU -> fallback path
    np.testing.assert_allclose(np.asarray(got), np.asarray(naive(q, k, v)), rtol=2e-5, atol=2e-5)


def test_flash_kernel_interpret_mode():
    """Run the Pallas kernel body under the interpreter for numerics."""
    from jax.experimental import pallas as pl

    T, D, BQ, BK = 64, 16, 32, 32
    key = jax.random.PRNGKey(3)
    q = jax.random.normal(key, (T, D), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (T, D), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (T, D), jnp.float32)

    out = pl.pallas_call(
        functools.partial(_flash_fwd_kernel, block_k=BK, sm_scale=1.0 / np.sqrt(D)),
        grid=(T // BQ,),
        in_specs=[
            pl.BlockSpec((BQ, D), lambda i: (i, 0)),
            pl.BlockSpec((T, D), lambda i: (0, 0)),
            pl.BlockSpec((T, D), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((BQ, D), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((T, D), jnp.float32),
        interpret=True,
    )(q, k, v)

    want = naive(q[None, :, None], k[None, :, None], v[None, :, None])[0, :, 0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=2e-5, atol=2e-5)
