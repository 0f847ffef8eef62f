"""chunked/flash attention vs naive attention: forward + backward parity.
On CPU flash_attention falls back to the chunked path; the Pallas forward
and backward kernels are exercised in interpret mode."""

import functools
from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moegan_tpu.ops import flash_attention as fa
from moegan_tpu.ops.chunked_attention import chunked_attention


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
    got = fa.flash_attention(q, k, v)  # CPU -> fallback path
    np.testing.assert_allclose(np.asarray(got), np.asarray(naive(q, k, v)), rtol=2e-5, atol=2e-5)
    # gradients flow through the fallback VJP
    g = jax.grad(lambda q: jnp.sum(fa.flash_attention(q, k, v) ** 2))(q)
    assert np.isfinite(np.asarray(g)).all()


def _interpreted(monkey_fn):
    """Run fn with pallas_call forced into interpret mode."""
    from jax.experimental import pallas as pl

    real = pl.pallas_call

    def fake(*a, **kw):
        kw["interpret"] = True
        return real(*a, **kw)

    return mock.patch.object(fa.pl, "pallas_call", fake)


def test_flash_forward_kernel_interpret(qkv):
    q, k, v = qkv
    with _interpreted(None), mock.patch.object(fa, "_supported", lambda *a: True):
        out = fa.flash_attention(q, k, v, 32, 64)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(naive(q, k, v)), rtol=2e-5, atol=2e-5
    )


def test_flash_backward_kernels_interpret(qkv):
    q, k, v = qkv

    def loss_flash(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v, 32, 64) ** 2)

    def loss_naive(q, k, v):
        return jnp.sum(naive(q, k, v) ** 2)

    with _interpreted(None), mock.patch.object(fa, "_supported", lambda *a: True):
        g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_naive, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4, err_msg=f"d{name}"
        )


@pytest.mark.parametrize("exp2", ["1", "0"])
@pytest.mark.parametrize("multi_kv", [True, False])
def test_flash_exp2_softmax_interpret(monkeypatch, exp2, multi_kv):
    """Base-2 softmax (MOEGAN_FLASH_EXP2): log2e folds into the score
    scale and exp2/log2 replace exp/log in BOTH kernels; the saved lse is
    in base-2 units but the pair reads the same flag at trace time, so
    outputs and all three gradients must be bit-compatible with the
    natural-base path up to fp32 rounding. multi_kv=True exercises the
    online-rescale arm (alpha = exp2(m_prev - m_new)); False the
    single-KV-iteration arm (the production res-64 regime at
    block_k=4096)."""
    monkeypatch.setenv("MOEGAN_FLASH_EXP2", exp2)
    k = jax.random.PRNGKey(7)
    T = 256
    shape = (2, T, 1, 16)
    q = jax.random.normal(k, shape)
    kk = jax.random.normal(jax.random.fold_in(k, 1), shape)
    v = jax.random.normal(jax.random.fold_in(k, 2), shape)
    block_k = 64 if multi_kv else T

    def loss_flash(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v, 128, block_k) ** 2)

    def loss_naive(q, k, v):
        return jnp.sum(naive(q, k, v) ** 2)

    with _interpreted(None), mock.patch.object(fa, "_supported", lambda *a: True):
        out = fa.flash_attention(q, kk, v, 128, block_k)
        g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, kk, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(naive(q, kk, v)), rtol=2e-5, atol=2e-5
    )
    g2 = jax.grad(loss_naive, argnums=(0, 1, 2))(q, kk, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4, err_msg=f"d{name}"
        )


@pytest.mark.parametrize("fused_l", ["1", "0"])
@pytest.mark.parametrize("multi_kv", [True, False])
def test_flash_fused_l_interpret(monkeypatch, fused_l, multi_kv):
    """MOEGAN_FLASH_FUSED_L folds the softmax denominator into the PV
    matmul (ones column appended to V inside the kernel); outputs and all
    three gradients must match the separate-sum formulation. multi_kv
    exercises the online alpha-rescale of the fused accumulator."""
    monkeypatch.setenv("MOEGAN_FLASH_FUSED_L", fused_l)
    fa._FUSED_L_CACHE.clear()
    k = jax.random.PRNGKey(5)
    T = 256
    shape = (2, T, 1, 16)
    q = jax.random.normal(k, shape)
    kk = jax.random.normal(jax.random.fold_in(k, 1), shape)
    v = jax.random.normal(jax.random.fold_in(k, 2), shape)
    block_k = 64 if multi_kv else T

    def loss_flash(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v, 128, block_k) ** 2)

    with _interpreted(None), mock.patch.object(fa, "_supported", lambda *a: True):
        out = fa.flash_attention(q, kk, v, 128, block_k)
        g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, kk, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(naive(q, kk, v)), rtol=2e-5, atol=2e-5
    )
    g2 = jax.grad(
        lambda q, k, v: jnp.sum(naive(q, k, v) ** 2), argnums=(0, 1, 2)
    )(q, kk, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4, err_msg=f"d{name}"
        )


@pytest.mark.parametrize("exp2", ["1", "0"])
@pytest.mark.parametrize("fused_l", ["1", "0"])
@pytest.mark.parametrize("multi_kv", [True, False])
def test_flash_nomax_interpret(monkeypatch, exp2, fused_l, multi_kv):
    """MOEGAN_FLASH_NOMAX drops the online row-max (shift-free softmax):
    outputs and all three gradients must match the naive reference for
    in-range scores, in both bases, with and without the fused
    denominator, single- and multi-KV-iteration."""
    monkeypatch.setenv("MOEGAN_FLASH_NOMAX", "1")
    monkeypatch.setenv("MOEGAN_FLASH_EXP2", exp2)
    monkeypatch.setenv("MOEGAN_FLASH_FUSED_L", fused_l)
    fa._NOMAX_CACHE.clear()
    fa._FUSED_L_CACHE.clear()
    k = jax.random.PRNGKey(11)
    T = 256
    shape = (2, T, 1, 16)
    q = jax.random.normal(k, shape)
    kk = jax.random.normal(jax.random.fold_in(k, 1), shape)
    v = jax.random.normal(jax.random.fold_in(k, 2), shape)
    block_k = 64 if multi_kv else T

    def loss_flash(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v, 128, block_k) ** 2)

    with _interpreted(None), mock.patch.object(fa, "_supported", lambda *a: True):
        out = fa.flash_attention(q, kk, v, 128, block_k)
        g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, kk, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(naive(q, kk, v)), rtol=2e-5, atol=2e-5
    )
    g2 = jax.grad(
        lambda q, k, v: jnp.sum(naive(q, k, v) ** 2), argnums=(0, 1, 2)
    )(q, kk, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4, err_msg=f"d{name}"
        )


@pytest.mark.parametrize(
    "flags",
    [
        {"MOEGAN_FLASH_DV_BF16": "1"},
        {"MOEGAN_FLASH_AUGSUB": "1"},
        {"MOEGAN_FLASH_PBF16": "1", "MOEGAN_FLASH_NOMAX": "1"},
        {"MOEGAN_FLASH_PBF16": "1"},  # fwd pbf16 gated off (needs NOMAX); bwd active
        {
            "MOEGAN_FLASH_DV_BF16": "1",
            "MOEGAN_FLASH_AUGSUB": "1",
            "MOEGAN_FLASH_PBF16": "1",
            "MOEGAN_FLASH_NOMAX": "1",
        },
    ],
    ids=["dv_bf16", "augsub", "pbf16_nomax", "pbf16_only", "all"],
)
@pytest.mark.parametrize("multi_kv", [True, False])
def test_flash_microopt_flags_interpret(monkeypatch, flags, multi_kv):
    """Round-5 VPU/MXU micro-opt flags, each against the naive reference:
    MOEGAN_FLASH_DV_BF16 (the backward's dv dot in storage dtype — the
    one fp32 MXU dot in the path), MOEGAN_FLASH_AUGSUB (the backward's
    -lse / -delta broadcast subtracts folded into the score/dp matmuls as
    augmented columns), MOEGAN_FLASH_PBF16 (scores drained bf16 from the
    MXU, exp2 on packed bf16 — forward only under NOMAX, backward
    always). PBF16 genuinely quantizes s to bf16, so its arms carry a
    bf16-level tolerance; the other two are exact-in-fp32 rewrites (test
    inputs are f32, where the storage-dtype casts are no-ops)."""
    for name, val in flags.items():
        monkeypatch.setenv(name, val)
    fa._DV_BF16_CACHE.clear()
    fa._AUGSUB_CACHE.clear()
    fa._PBF16_CACHE.clear()
    fa._NOMAX_CACHE.clear()
    k = jax.random.PRNGKey(13)
    T = 256
    shape = (2, T, 1, 16)
    q = jax.random.normal(k, shape)
    kk = jax.random.normal(jax.random.fold_in(k, 1), shape)
    v = jax.random.normal(jax.random.fold_in(k, 2), shape)
    block_k = 64 if multi_kv else T

    def loss_flash(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v, 128, block_k) ** 2)

    with _interpreted(None), mock.patch.object(fa, "_supported", lambda *a: True):
        out = fa.flash_attention(q, kk, v, 128, block_k)
        g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, kk, v)
    loose = flags.get("MOEGAN_FLASH_PBF16") == "1"
    tol_out = dict(rtol=3e-2, atol=3e-2) if loose else dict(rtol=2e-5, atol=2e-5)
    tol_g = dict(rtol=8e-2, atol=8e-2) if loose else dict(rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(naive(q, kk, v)), **tol_out
    )
    g2 = jax.grad(
        lambda q, k, v: jnp.sum(naive(q, k, v) ** 2), argnums=(0, 1, 2)
    )(q, kk, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), **tol_g, err_msg=f"d{name}"
        )


def test_flash_exp2_env_flip_between_fwd_and_bwd(monkeypatch):
    """The exp2 flag is bound ONCE at the flash_attention call as a static
    custom_vjp argument — flipping MOEGAN_FLASH_EXP2 between the eager
    forward (which saves the lse in the flag's base) and the backward
    (which re-exponentiates against it) must NOT corrupt gradients (the
    round-4 advisor finding: re-reading the env var at backward trace time
    consumed a base-2 lse as natural-log)."""
    monkeypatch.setenv("MOEGAN_FLASH_EXP2", "1")
    k = jax.random.PRNGKey(11)
    shape = (2, 128, 1, 16)
    q = jax.random.normal(k, shape)
    kk = jax.random.normal(jax.random.fold_in(k, 1), shape)
    v = jax.random.normal(jax.random.fold_in(k, 2), shape)

    with _interpreted(None), mock.patch.object(fa, "_supported", lambda *a: True):
        out, vjp = jax.vjp(
            lambda q_: fa.flash_attention(q_, kk, v, 128, 64), q
        )
        # Flip the env var AFTER the forward saved its (base-2) lse.
        monkeypatch.setenv("MOEGAN_FLASH_EXP2", "0")
        fa._EXP2_CACHE.clear()
        (dq,) = vjp(jnp.ones_like(out))
    dq_ref = jax.grad(lambda q_: jnp.sum(naive(q_, kk, v)))(q)
    np.testing.assert_allclose(
        np.asarray(dq), np.asarray(dq_ref), rtol=2e-4, atol=2e-4
    )


@pytest.mark.parametrize("compact", ["1", "0"])
@pytest.mark.parametrize("T", [256, 1024])
def test_flash_compact_lse_interpret(monkeypatch, T, compact):
    """Compact lse (default since the round-4 A/B) stores the logsumexp
    residual as [BH, T//block_q, block_q] lane-packed rows (relayout done
    via identity matmuls — the only formulation Mosaic lowers; see
    _fwd_kernel) instead of the 128x-padded lane-broadcast; forward AND
    gradients must be unchanged, in BOTH layouts (compact="0" covers the
    opt-out lane-broadcast path at the production block size).

    T=1024 is the multi-q-tile case (4 tiles of block_q=256): both
    rejected formulations failed on hardware at exactly this regime
    (runs/r4_tpu_log1.txt item b, runs/r4_tpu_log2.txt item a)."""
    monkeypatch.setenv("MOEGAN_FLASH_COMPACT_LSE", compact)
    k = jax.random.PRNGKey(3)
    shape = (2, T, 1, 16)  # block_q=256 -> compact gate active
    q = jax.random.normal(k, shape)
    kk = jax.random.normal(jax.random.fold_in(k, 1), shape)
    v = jax.random.normal(jax.random.fold_in(k, 2), shape)

    def loss_flash(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v, 256, 128) ** 2)

    def loss_naive(q, k, v):
        return jnp.sum(naive(q, k, v) ** 2)

    with _interpreted(None), mock.patch.object(fa, "_supported", lambda *a: True):
        out = fa.flash_attention(q, kk, v, 256, 128)
        g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, kk, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(naive(q, kk, v)), rtol=2e-5, atol=2e-5
    )
    g2 = jax.grad(loss_naive, argnums=(0, 1, 2))(q, kk, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4, err_msg=f"d{name}"
        )
