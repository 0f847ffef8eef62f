"""Prototype Bayesian-MoE package: BayesianLinear KL, gating network,
HMC uncertainty, KMeans cluster training (reference moe/ package)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moegan_tpu.prototype.bayesian import BayesianLinear, scale_mixture_log_prob
from moegan_tpu.prototype.gating import (
    BayesianMoEGatingNetwork,
    hamiltonian_monte_carlo,
    predict_expert,
)
from moegan_tpu.prototype.training import (
    balance_loss_uniform,
    cluster_text_embeddings,
    analyze_clusters,
    train_moe_with_clusters,
)


def test_bayesian_linear_sampling_and_kl():
    layer = BayesianLinear(8)
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (3, 4))
    params = layer.init({"params": k, "router": k}, x)
    y1, kl1 = layer.apply(params, x, True, rngs={"router": jax.random.PRNGKey(1)})
    y2, kl2 = layer.apply(params, x, True, rngs={"router": jax.random.PRNGKey(2)})
    assert y1.shape == (3, 8)
    assert not np.allclose(np.asarray(y1), np.asarray(y2))  # weight noise
    # eval: deterministic mean weights, zero KL
    ye, kle = layer.apply(params, x, False)
    ye2, _ = layer.apply(params, x, False)
    np.testing.assert_array_equal(np.asarray(ye), np.asarray(ye2))
    assert float(kle) == 0.0
    assert np.isfinite(float(kl1))


def test_scale_mixture_prior_prefers_small_weights():
    small = scale_mixture_log_prob(jnp.full((10,), 0.001))
    large = scale_mixture_log_prob(jnp.full((10,), 3.0))
    assert float(small) > float(large)


@pytest.fixture(scope="module")
def gating():
    g = BayesianMoEGatingNetwork(hidden_dim=16, num_experts=4)
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (2, 8))
    params = g.init({"params": k, "router": k}, x)
    return g, params, x


def test_gating_forward(gating):
    g, params, x = gating
    probs, kl, logits = g.apply(params, x, sample=True, rngs={"router": jax.random.PRNGKey(1)})
    assert probs.shape == (2, 4) and logits.shape == (2, 4)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=1e-5)
    assert np.isfinite(float(kl))


def test_hmc_uncertainty(gating):
    g, params, x = gating
    mean_probs, unc, acc_rate = hamiltonian_monte_carlo(
        g, params, x[:1], jax.random.PRNGKey(0), num_samples=10, burn_in=5,
        num_steps=3,
    )
    assert mean_probs.shape == (1, 4) and unc.shape == (1, 4)
    np.testing.assert_allclose(np.asarray(mean_probs).sum(-1), 1.0, rtol=1e-4)
    assert (np.asarray(unc) >= 0).all()
    assert 0.0 <= float(acc_rate) <= 1.0


def test_predict_expert_threshold(gating):
    g, params, x = gating
    sel, mp, unc = predict_expert(
        g, params, x[:1], jax.random.PRNGKey(1), num_samples=5, burn_in=3
    )
    assert len(sel) >= 1 and all(0 <= s < 4 for s in sel)


def test_balance_loss_uniform_zero_at_uniform():
    probs = jnp.full((10, 4), 0.25)
    assert float(balance_loss_uniform(probs)) == pytest.approx(0.0, abs=1e-6)
    skew = jnp.asarray(np.eye(4, dtype=np.float32)[np.zeros(10, int)])
    assert float(balance_loss_uniform(skew)) > 1.0


def test_cluster_training_learns_labels():
    """Separable clusters -> router val accuracy well above chance."""
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(4, 32)) * 5
    labels = rng.integers(0, 4, 400)
    emb = centers[labels] + rng.normal(size=(400, 32)) * 0.3

    found_labels, found_centers = cluster_text_embeddings(emb, n_clusters=4, seed=1)
    assert found_centers.shape == (4, 32)
    # clustering should recover the structure (up to permutation):
    # most members of each true cluster share a found label
    purity = 0
    for c in range(4):
        if (labels == c).sum():
            purity += np.bincount(found_labels[labels == c]).max()
    assert purity / len(labels) > 0.95

    descs = analyze_clusters(emb, found_labels)
    assert len(descs) == 4

    _, _, hist = train_moe_with_clusters(
        emb, found_labels, hidden_dim=32, epochs=6, batch_size=64, seed=0
    )
    assert hist["val_accuracy"][-1] > 0.6
    assert hist["train_loss"][-1] < hist["train_loss"][0]


def test_enhanced_dataset_container():
    """EnhancedMSCOCODataset analog (ref moe_integration.py:32-73): wraps
    a processed dataset with cluster labels; trainers accept it directly."""
    from moegan_tpu.data.datasets import EnhancedMSCOCODataset, synthetic_dataset

    base = synthetic_dataset(40, 16, seed=3, text_dim=32)
    ds = EnhancedMSCOCODataset.from_dataset(base, n_clusters=3, seed=1)
    assert len(ds) == 40
    img, emb, lab = ds[0]
    assert img.shape == (16, 16, 3) and emb.shape == (32,)
    assert 0 <= int(lab) < 3
    assert ds.num_clusters <= 3
    assert len(ds.cluster_descriptions) == ds.num_clusters

    _, _, hist = train_moe_with_clusters(ds, epochs=2, hidden_dim=16, batch_size=16)
    assert len(hist["val_accuracy"]) == 2

    with pytest.raises(ValueError):
        EnhancedMSCOCODataset(base, np.zeros(3, np.int32))
