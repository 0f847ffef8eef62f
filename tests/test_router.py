"""BayesianRouter semantics: clamped reparameterization, temperature
annealing, prob floor + renorm, hard top-1 at eval, closed-form KL
(reference t2i_moe_gan.py:265-423)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moegan_tpu.core.router import BayesianRouter, gaussian_kl, reparameterize


@pytest.fixture(scope="module")
def router():
    r = BayesianRouter(feature_dim=8, text_dim=12, num_experts=4, hidden=16)
    k = jax.random.PRNGKey(0)
    feat = jax.random.normal(k, (2, 10, 8))
    txt = jax.random.normal(jax.random.fold_in(k, 1), (2, 12))
    params = r.init({"params": k, "router": k}, feat, txt)
    return r, params, feat, txt


def test_train_probs_soft_and_normalized(router):
    r, params, feat, txt = router
    probs, logits = r.apply(
        params, feat, txt, sampling=True, rngs={"router": jax.random.PRNGKey(3)}
    )
    assert probs.shape == (2, 10, 4) and logits.shape == (2, 10, 4)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-5)
    assert (np.asarray(probs) > 0).all()  # prob floor
    assert not ((np.asarray(probs) == 0) | (np.asarray(probs) == 1)).all()


def test_eval_uses_means_and_is_deterministic(router):
    r, params, feat, txt = router
    p1, _ = r.apply(params, feat, txt, sampling=False)
    p2, _ = r.apply(params, feat, txt, sampling=False)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_hard_routing_one_hot(router):
    r, params, feat, txt = router
    probs, _ = r.apply(params, feat, txt, sampling=False, hard=True)
    p = np.asarray(probs)
    assert ((p == 0) | (p == 1)).all()
    np.testing.assert_allclose(p.sum(-1), 1.0)


def test_sampling_depends_on_rng(router):
    r, params, feat, txt = router
    pa, _ = r.apply(params, feat, txt, sampling=True, rngs={"router": jax.random.PRNGKey(1)})
    pb, _ = r.apply(params, feat, txt, sampling=True, rngs={"router": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(pa), np.asarray(pb))


def test_annealing_flattens_distribution(router):
    r, params, feat, txt = router
    sharp, _ = r.apply(params, feat, txt, sampling=False, annealing_factor=0.125)
    flat, _ = r.apply(params, feat, txt, sampling=False, annealing_factor=1.25)
    ent = lambda p: -np.sum(np.asarray(p) * np.log(np.asarray(p)), -1).mean()
    assert ent(flat) >= ent(sharp) - 1e-6


def test_reparameterize_clamps():
    mu = jnp.array([[-100.0, 100.0]])
    rho = jnp.array([[10.0, -20.0]])
    eps = jnp.array([[5.0, -5.0]])
    out = np.asarray(reparameterize(mu, rho, eps))
    # mu clamps to +-10, rho to [-8,4], sigma to <=10, eps to +-2
    sigma_hi = np.log1p(np.exp(4.0))
    sigma_lo = np.log1p(np.exp(-8.0))
    assert out[0, 0] == pytest.approx(-10.0 + sigma_hi * 2.0, rel=1e-5)
    assert out[0, 1] == pytest.approx(10.0 - sigma_lo * 2.0, rel=1e-5)


def test_kl_closed_form_matches_manual():
    mu = jnp.array([[0.3, -0.2]])
    rho = jnp.array([[-1.0, 0.5]])
    sigma = np.log1p(np.exp(np.asarray(rho)))
    manual = 0.5 * np.sum(sigma**2 + np.asarray(mu) ** 2 - 1 - np.log(sigma**2))
    assert float(gaussian_kl(mu, rho)) == pytest.approx(float(manual), rel=1e-5)


def test_kl_divergence_clamped(router):
    r, params, *_ = router
    kl = r.apply(params, method=r.kl_divergence)
    assert 0.0 <= float(kl) <= 120.0
