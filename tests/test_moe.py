"""SparseMoE: the stacked-weight dense mixture must equal a per-expert
loop, and the eval path must equal the reference's hard argmax dispatch
(t2i_moe_gan.py:465-483)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moegan_tpu.core.moe import SparseMoE


@pytest.fixture(scope="module")
def moe():
    m = SparseMoE(dim=8, text_dim=12, num_experts=4, router_hidden=8, compute_dtype=jnp.float32)
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (2, 9, 8))
    w = jax.random.normal(jax.random.fold_in(k, 1), (2, 12))
    params = m.init({"params": k, "router": k}, x, w)
    return m, params, x, w


def _expert_ffn(p, x, e):
    """One expert's Linear-GELU-Linear in numpy (exact gelu)."""
    from scipy.stats import norm

    w1 = np.asarray(p["w1"][e]); b1 = np.asarray(p["b1"][e])
    w2 = np.asarray(p["w2"][e]); b2 = np.asarray(p["b2"][e])
    h = x @ w1 + b1
    h = h * norm.cdf(h)
    return h @ w2 + b2


def test_train_mixture_equals_per_expert_loop(moe):
    m, params, x, w = moe
    out, kl, probs = m.apply(
        params, x, w, training=True, rngs={"router": jax.random.PRNGKey(7)}
    )
    p = params["params"]
    xn = np.asarray(x)
    pr = np.asarray(probs)
    want = np.zeros_like(xn)
    for e in range(4):
        want += pr[..., e : e + 1] * _expert_ffn(p, xn, e)
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-4, atol=2e-5)
    assert float(kl) > 0.0


def test_eval_equals_hard_argmax_dispatch(moe):
    """One-hot mixture == boolean-mask dispatch of the reference (:471-483)."""
    m, params, x, w = moe
    out, kl, probs = m.apply(params, x, w, training=False)
    assert float(kl) == 0.0  # ref :489 — no KL at eval
    p = params["params"]
    xn = np.asarray(x)
    sel = np.argmax(np.asarray(probs), -1)  # [B, T]
    want = np.zeros_like(xn)
    for e in range(4):
        mask = sel == e
        if mask.any():
            want[mask] = _expert_ffn(p, xn[mask], e)
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-4, atol=2e-5)


def test_expert_weights_are_stacked_for_sharding(moe):
    _, params, _, _ = moe
    p = params["params"]
    assert p["w1"].shape[0] == 4 and p["w2"].shape[0] == 4
