"""Fused MoE op: XLA reference formulation vs the einsum SparseMoE path,
Pallas kernel numerics in interpret mode, gradient flow."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moegan_tpu.core.moe import SparseMoE
from moegan_tpu.ops.fused_moe import (
    _fused_moe_kernel,
    fused_moe_ffn,
    moe_ffn_reference,
)


@pytest.fixture(scope="module")
def moes():
    """Two SparseMoE modules sharing params: einsum path vs fused path."""
    kwargs = dict(dim=8, text_dim=12, num_experts=4, router_hidden=8,
                  compute_dtype=jnp.float32)
    m_ein = SparseMoE(use_pallas=False, **kwargs)
    m_fused = SparseMoE(use_pallas=True, **kwargs)
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (2, 9, 8))
    w = jax.random.normal(jax.random.fold_in(k, 1), (2, 12))
    params = m_ein.init({"params": k, "router": k}, x, w)
    return m_ein, m_fused, params, x, w


def test_fused_matches_einsum_eval(moes):
    m_ein, m_fused, params, x, w = moes
    out1, kl1, p1 = m_ein.apply(params, x, w, training=False)
    out2, kl2, p2 = m_fused.apply(params, x, w, training=False)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-4, atol=1e-5)


def test_fused_matches_einsum_train_same_rng(moes):
    m_ein, m_fused, params, x, w = moes
    r = {"router": jax.random.PRNGKey(5)}
    out1, kl1, p1 = m_ein.apply(params, x, w, training=True, rngs=r)
    out2, kl2, p2 = m_fused.apply(params, x, w, training=True, rngs=r)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-4, atol=1e-5)
    assert float(kl1) == float(kl2)


def test_fused_gradients_flow(moes):
    _, m_fused, params, x, w = moes

    def loss(p):
        out, kl, probs = m_fused.apply(
            p, x, w, training=True, rngs={"router": jax.random.PRNGKey(1)}
        )
        return jnp.sum(out**2) + 0.1 * jnp.sum(probs**2)

    grads = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # expert weights and router means must receive gradient
    gp = grads["params"]
    assert float(jnp.abs(gp["w1"]).sum()) > 0
    assert float(jnp.abs(gp["router"]["feature_mu"]).sum()) > 0


def test_kernel_interpret_matches_reference():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, C, H, E, F = 64, 16, 8, 4, 64
    BT = 32
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    x = jax.random.normal(ks[0], (T, C), jnp.float32)
    fw = jax.random.normal(ks[1], (C, H)) * 0.1
    cw = jax.random.normal(ks[2], (H, E)) * 0.1
    tl = jax.random.normal(ks[3], (T, E)) * 0.1
    w1 = jax.random.normal(ks[4], (E, C, F)) * 0.1
    b1 = jax.random.normal(ks[5], (E, F)) * 0.1
    w2 = jax.random.normal(ks[6], (E, F, C)) * 0.1
    b2 = jax.random.normal(ks[7], (E, C)) * 0.1
    it = jnp.full((1,), 0.5, jnp.float32)

    for hard in (False, True):
        out, probs = pl.pallas_call(
            functools.partial(_fused_moe_kernel, num_experts=E, hard=hard),
            grid=(T // BT, E),
            in_specs=[
                pl.BlockSpec((BT, C), lambda t, e: (t, 0)),
                pl.BlockSpec((C, H), lambda t, e: (0, 0)),
                pl.BlockSpec((H, E), lambda t, e: (0, 0)),
                pl.BlockSpec((BT, E), lambda t, e: (t, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, C, F), lambda t, e: (e, 0, 0)),
                pl.BlockSpec((1, 1, F), lambda t, e: (e, 0, 0)),
                pl.BlockSpec((1, F, C), lambda t, e: (e, 0, 0)),
                pl.BlockSpec((1, 1, C), lambda t, e: (e, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((BT, C), lambda t, e: (t, 0)),
                pl.BlockSpec((BT, E), lambda t, e: (t, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((T, C), jnp.float32),
                jax.ShapeDtypeStruct((T, E), jnp.float32),
            ],
            interpret=True,
        )(x, fw, cw, tl, it, w1, b1[:, None, :], w2, b2[:, None, :])

        want_out, want_probs = moe_ffn_reference(x, fw, cw, tl, 0.5, w1, b1, w2, b2, hard)
        np.testing.assert_allclose(np.asarray(probs), np.asarray(want_probs), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want_out), rtol=1e-4, atol=1e-5)


def test_pallas_backward_matches_xla_vjp():
    """The fused backward kernels (interpret mode) must reproduce the
    XLA-recompute gradients for every input."""
    from unittest import mock

    import moegan_tpu.ops.fused_moe as fm

    T, C, H, E, F = 64, 16, 8, 4, 32
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 10)
    x = jax.random.normal(ks[0], (T, C), jnp.float32)
    fw = jax.random.normal(ks[1], (C, H)) * 0.1
    cw = jax.random.normal(ks[2], (H, E)) * 0.1
    tl = jax.random.normal(ks[3], (T, E)) * 0.1
    it = jnp.float32(0.5)
    w1 = jax.random.normal(ks[4], (E, C, F)) * 0.1
    b1 = jax.random.normal(ks[5], (E, F)) * 0.1
    w2 = jax.random.normal(ks[6], (E, F, C)) * 0.1
    b2 = jax.random.normal(ks[7], (E, C)) * 0.1
    dout = jax.random.normal(ks[8], (T, C))
    dprobs = jax.random.normal(ks[9], (T, E)) * 0.1

    def loss_ref(*args):
        out, probs = fm.moe_ffn_reference(*args, False)
        return jnp.sum(out * dout) + jnp.sum(probs * dprobs)

    want = jax.grad(loss_ref, argnums=tuple(range(9)))(
        x, fw, cw, tl, it, w1, b1, w2, b2
    )

    real_call = fm.pl.pallas_call

    def interp_call(*a, **kw):
        kw["interpret"] = True
        return real_call(*a, **kw)

    with mock.patch.object(fm.pl, "pallas_call", interp_call):
        got = fm._fused_moe_bwd_pallas(
            (x, fw, cw, tl, it, w1, b1, w2, b2), dout, dprobs, block_t=32
        )

    names = ["dx", "dfw", "dcw", "dtl", "dit", "dw1", "db1", "dw2", "db2"]
    for name, a, b in zip(names, got, want):
        np.testing.assert_allclose(
            np.asarray(a, np.float32).reshape(np.shape(b)),
            np.asarray(b, np.float32),
            rtol=5e-4, atol=5e-5, err_msg=name,
        )


def test_single_kernel_backward_matches_xla_vjp():
    """The round-2 ONE-kernel backward (shared z/h recompute feeding
    dx/dW1/dW2, VMEM-resident weight-grad accumulators) must reproduce
    the XLA-recompute gradients exactly like the 3-kernel version."""
    from unittest import mock

    import moegan_tpu.ops.fused_moe as fm

    T, C, H, E, F = 64, 16, 8, 4, 32
    key = jax.random.PRNGKey(42)
    ks = jax.random.split(key, 10)
    x = jax.random.normal(ks[0], (T, C), jnp.float32)
    fw = jax.random.normal(ks[1], (C, H)) * 0.1
    cw = jax.random.normal(ks[2], (H, E)) * 0.1
    tl = jax.random.normal(ks[3], (T, E)) * 0.1
    it = jnp.float32(0.5)
    w1 = jax.random.normal(ks[4], (E, C, F)) * 0.1
    b1 = jax.random.normal(ks[5], (E, F)) * 0.1
    w2 = jax.random.normal(ks[6], (E, F, C)) * 0.1
    b2 = jax.random.normal(ks[7], (E, C)) * 0.1
    dout = jax.random.normal(ks[8], (T, C))
    dprobs = jax.random.normal(ks[9], (T, E)) * 0.1

    def loss_ref(*args):
        out, probs = fm.moe_ffn_reference(*args, False)
        return jnp.sum(out * dout) + jnp.sum(probs * dprobs)

    want = jax.grad(loss_ref, argnums=tuple(range(9)))(
        x, fw, cw, tl, it, w1, b1, w2, b2
    )

    assert fm._single_bwd_supported(C, F, E)
    real_call = fm.pl.pallas_call

    def interp_call(*a, **kw):
        kw["interpret"] = True
        return real_call(*a, **kw)

    with mock.patch.object(fm.pl, "pallas_call", interp_call):
        got = fm._fused_moe_bwd_single(
            (x, fw, cw, tl, it, w1, b1, w2, b2), dout, dprobs, block_t=32
        )

    names = ["dx", "dfw", "dcw", "dtl", "dit", "dw1", "db1", "dw2", "db2"]
    for name, a, b in zip(names, got, want):
        np.testing.assert_allclose(
            np.asarray(a, np.float32).reshape(np.shape(b)),
            np.asarray(b, np.float32),
            rtol=5e-4, atol=5e-5, err_msg=name,
        )


def test_single_bwd_vmem_gate():
    import moegan_tpu.ops.fused_moe as fm

    assert fm._single_bwd_supported(128, 512, 4)   # flagship hi-token blocks
    assert not fm._single_bwd_supported(512, 2048, 4)  # 32MB of accumulators


def test_fused_gradients_flow_via_pallas_bwd(moes):
    """End-to-end custom_vjp path on CPU falls back; force-support to run
    the Pallas bwd assembly in interpret mode through SparseMoE."""
    from unittest import mock

    import moegan_tpu.ops.fused_moe as fm

    _, m_fused, params, x, w = moes

    def loss(p):
        out, kl, probs = m_fused.apply(
            p, x, w, training=True, rngs={"router": jax.random.PRNGKey(1)}
        )
        return jnp.sum(out**2) + 0.1 * jnp.sum(probs**2)

    real_call = fm.pl.pallas_call

    def interp_call(*a, **kw):
        kw["interpret"] = True
        return real_call(*a, **kw)

    import os

    with mock.patch.object(fm.pl, "pallas_call", interp_call), \
         mock.patch.object(fm, "_pallas_supported", lambda x, bt: x.shape[0] % bt == 0), \
         mock.patch.dict(os.environ, {"MOEGAN_PALLAS_MOE_BWD": "1"}):
        g1 = jax.grad(loss)(params)
    g2 = jax.grad(loss)(params)  # CPU fallback (XLA recompute) path
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4)


def test_combine_kernel_interpret_matches_reference():
    """The probs-as-input FFN+combine kernel (the expert-sharded
    formulation) must match the XLA reference, including with a local
    expert count smaller than the full E (a shard's view)."""
    from unittest import mock

    import moegan_tpu.ops.fused_moe as fm

    T, C, F = 64, 16, 32
    key = jax.random.PRNGKey(3)
    real_call = fm.pl.pallas_call

    def interp_call(*a, **kw):
        kw["interpret"] = True
        return real_call(*a, **kw)

    for E in (4, 2, 1):  # full, half-shard, single-expert shard
        ks = jax.random.split(jax.random.fold_in(key, E), 6)
        x = jax.random.normal(ks[0], (T, C), jnp.float32)
        probs = jax.nn.softmax(jax.random.normal(ks[1], (T, E)))
        w1 = jax.random.normal(ks[2], (E, C, F)) * 0.1
        b1 = jax.random.normal(ks[3], (E, F)) * 0.1
        w2 = jax.random.normal(ks[4], (E, F, C)) * 0.1
        b2 = jax.random.normal(ks[5], (E, C)) * 0.1

        with mock.patch.object(fm.pl, "pallas_call", interp_call), \
             mock.patch.object(fm, "_pallas_supported", lambda x, bt: x.shape[0] % bt == 0):
            got = fm.moe_ffn_combine(x, probs, w1, b1, w2, b2, 32)
        want = fm.moe_ffn_combine_reference(x, probs, w1, b1, w2, b2)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5,
            err_msg=f"E={E}",
        )


def test_combine_backward_matches_xla_vjp():
    """Single-kernel backward of the combine op vs XLA recompute grads."""
    from unittest import mock

    import moegan_tpu.ops.fused_moe as fm

    T, C, E, F = 64, 16, 2, 32
    ks = jax.random.split(jax.random.PRNGKey(7), 7)
    x = jax.random.normal(ks[0], (T, C), jnp.float32)
    probs = jax.nn.softmax(jax.random.normal(ks[1], (T, E)))
    w1 = jax.random.normal(ks[2], (E, C, F)) * 0.1
    b1 = jax.random.normal(ks[3], (E, F)) * 0.1
    w2 = jax.random.normal(ks[4], (E, F, C)) * 0.1
    b2 = jax.random.normal(ks[5], (E, C)) * 0.1
    dout = jax.random.normal(ks[6], (T, C))

    def loss_ref(*args):
        return jnp.sum(fm.moe_ffn_combine_reference(*args) * dout)

    want = jax.grad(loss_ref, argnums=tuple(range(6)))(x, probs, w1, b1, w2, b2)

    real_call = fm.pl.pallas_call

    def interp_call(*a, **kw):
        kw["interpret"] = True
        return real_call(*a, **kw)

    with mock.patch.object(fm.pl, "pallas_call", interp_call):
        got = fm._combine_bwd_pallas((x, probs, w1, b1, w2, b2), dout, 32)

    names = ["dx", "dprobs", "dw1", "db1", "dw2", "db2"]
    for name, a, b in zip(names, got, want):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=5e-4, atol=5e-5, err_msg=name,
        )


def test_padding_path(moes):
    """Token counts that don't tile still produce correct slices."""
    _, m_fused, params, x, w = moes
    out, _, probs = m_fused.apply(params, x, w, training=False)
    assert out.shape == (2, 9, 8) and probs.shape == (2, 9, 4)


def _interp_patch(fm):
    from unittest import mock

    real_call = fm.pl.pallas_call

    def interp_call(*a, **kw):
        kw["interpret"] = True
        return real_call(*a, **kw)

    return mock.patch.object(fm.pl, "pallas_call", interp_call)


def test_v2_forward_matches_reference():
    """The v2 fused kernel (no expert grid, stacked-width matmuls) must
    reproduce the reference math, soft and hard."""
    import moegan_tpu.ops.fused_moe as fm

    T, C, H, E, F = 64, 16, 8, 4, 32
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    x = jax.random.normal(ks[0], (T, C), jnp.float32)
    fw = jax.random.normal(ks[1], (C, H)) * 0.1
    cw = jax.random.normal(ks[2], (H, E)) * 0.1
    tl = jax.random.normal(ks[3], (T, E)) * 0.1
    w1 = jax.random.normal(ks[4], (E, C, F)) * 0.1
    b1 = jax.random.normal(ks[5], (E, F)) * 0.1
    w2 = jax.random.normal(ks[6], (E, F, C)) * 0.1
    b2 = jax.random.normal(ks[7], (E, C)) * 0.1

    for hard in (False, True):
        with _interp_patch(fm):
            out, probs = fm._fused_moe_pallas_v2(
                x, fw, cw, tl, 0.5, w1, b1, w2, b2, hard, 32
            )
        want_out, want_probs = fm.moe_ffn_reference(
            x, fw, cw, tl, 0.5, w1, b1, w2, b2, hard
        )
        np.testing.assert_allclose(
            np.asarray(probs), np.asarray(want_probs), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(want_out), rtol=1e-4, atol=1e-5,
            err_msg=f"hard={hard}")


def test_v2_backward_matches_xla_vjp():
    import moegan_tpu.ops.fused_moe as fm

    T, C, H, E, F = 64, 16, 8, 4, 32
    ks = jax.random.split(jax.random.PRNGKey(1), 10)
    x = jax.random.normal(ks[0], (T, C), jnp.float32)
    fw = jax.random.normal(ks[1], (C, H)) * 0.1
    cw = jax.random.normal(ks[2], (H, E)) * 0.1
    tl = jax.random.normal(ks[3], (T, E)) * 0.1
    it = jnp.float32(0.5)
    w1 = jax.random.normal(ks[4], (E, C, F)) * 0.1
    b1 = jax.random.normal(ks[5], (E, F)) * 0.1
    w2 = jax.random.normal(ks[6], (E, F, C)) * 0.1
    b2 = jax.random.normal(ks[7], (E, C)) * 0.1
    dout = jax.random.normal(ks[8], (T, C))
    dprobs = jax.random.normal(ks[9], (T, E)) * 0.1

    def loss_ref(*args):
        out, probs = fm.moe_ffn_reference(*args, False)
        return jnp.sum(out * dout) + jnp.sum(probs * dprobs)

    want = jax.grad(loss_ref, argnums=tuple(range(9)))(
        x, fw, cw, tl, it, w1, b1, w2, b2
    )
    with _interp_patch(fm):
        got = fm._fused_moe_bwd_v2(
            (x, fw, cw, tl, it, w1, b1, w2, b2), dout, dprobs, 32
        )
    names = ["dx", "dfw", "dcw", "dtl", "dit", "dw1", "db1", "dw2", "db2"]
    for name, a, b in zip(names, got, want):
        np.testing.assert_allclose(
            np.asarray(a, np.float32).reshape(np.shape(b)),
            np.asarray(b, np.float32), rtol=5e-4, atol=5e-5, err_msg=name)


def test_combine_v2_matches_reference_fwd_and_bwd():
    import moegan_tpu.ops.fused_moe as fm

    T, C, E, F = 64, 16, 2, 32  # E=2: a local expert shard's view
    ks = jax.random.split(jax.random.PRNGKey(2), 7)
    x = jax.random.normal(ks[0], (T, C), jnp.float32)
    probs = jax.nn.softmax(jax.random.normal(ks[1], (T, E)))
    w1 = jax.random.normal(ks[2], (E, C, F)) * 0.1
    b1 = jax.random.normal(ks[3], (E, F)) * 0.1
    w2 = jax.random.normal(ks[4], (E, F, C)) * 0.1
    b2 = jax.random.normal(ks[5], (E, C)) * 0.1
    dout = jax.random.normal(ks[6], (T, C))

    with _interp_patch(fm):
        got = fm._combine_fwd_pallas_v2(x, probs, w1, b1, w2, b2, 32)
    want = fm.moe_ffn_combine_reference(x, probs, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)

    def loss_ref(*args):
        return jnp.sum(fm.moe_ffn_combine_reference(*args) * dout)

    want_g = jax.grad(loss_ref, argnums=tuple(range(6)))(x, probs, w1, b1, w2, b2)
    with _interp_patch(fm):
        got_g = fm._combine_bwd_pallas_v2((x, probs, w1, b1, w2, b2), dout, 32)
    for name, a, b in zip(["dx", "dp", "dw1", "db1", "dw2", "db2"], got_g, want_g):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=5e-4, atol=5e-5, err_msg=name)


def test_single_bwd_vmem_gate_is_token_aware():
    """Under a raised Mosaic limit the compiler keeps whole dx/dp in
    VMEM, so C=256 admission must depend on T: the b64 res-8 shape
    (T=4096) fits the 24 MB default, the b128 shape (T=8192) must fall
    back to XLA recompute instead of a compile-time VMEM OOM
    (chain-5 item c, runs/r4_tpu_log5.txt)."""
    from moegan_tpu.ops import fused_moe as fm

    # C<=128 regime: historical gate, admitted at any T.
    assert fm._single_bwd_supported(128, 512, 4, 32768)
    # C=256 needs the raised budget: T-dependent.
    assert fm._single_bwd_supported(256, 1024, 4, 4096)
    assert not fm._single_bwd_supported(256, 1024, 4, 8192)
    # No T (forward kernel choice): accumulator-only check.
    assert fm._single_bwd_supported(256, 1024, 4)
