"""Blundell-style Bayesian Linear layer (weight uncertainty).

Reference: moe/moe_model.py:7-123. Posterior N(mu, softplus(rho)^2) over
weights and biases, reparameterized sampling, and KL estimated as
log q(w|theta) - log P(w) with a scale-mixture-of-Gaussians prior
(sigma1=1.0, sigma2=0.0025, pi=0.5).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from moegan_tpu.core import inits

PRIOR_SIGMA_1 = 1.0
PRIOR_SIGMA_2 = 0.0025
PRIOR_PI = 0.5


def _log_gaussian(x, mu, sigma):
    return (
        -0.5 * math.log(2 * math.pi)
        - jnp.log(sigma)
        - 0.5 * jnp.square((x - mu) / sigma)
    )


def scale_mixture_log_prob(w):
    """log P(w) under the two-Gaussian scale mixture prior."""
    p1 = PRIOR_PI * jnp.exp(_log_gaussian(w, 0.0, PRIOR_SIGMA_1))
    p2 = (1 - PRIOR_PI) * jnp.exp(_log_gaussian(w, 0.0, PRIOR_SIGMA_2))
    return jnp.sum(jnp.log(p1 + p2 + 1e-30))


class BayesianLinear(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x: jax.Array, sample: bool = True):
        """Returns (y, kl) where kl = log q(w) - log P(w) for the sampled
        weights (0 when sample=False, matching the reference eval path)."""
        in_dim = x.shape[-1]
        w_mu = self.param("w_mu", inits.normal(0.1), (in_dim, self.features))
        w_rho = self.param("w_rho", inits.constant(-3.0), (in_dim, self.features))
        b_mu = self.param("b_mu", inits.normal(0.1), (self.features,))
        b_rho = self.param("b_rho", inits.constant(-3.0), (self.features,))

        if sample:
            kw, kb = jax.random.split(self.make_rng("router"))
            w_sigma = jnp.log1p(jnp.exp(w_rho))
            b_sigma = jnp.log1p(jnp.exp(b_rho))
            w = w_mu + w_sigma * jax.random.normal(kw, w_mu.shape)
            b = b_mu + b_sigma * jax.random.normal(kb, b_mu.shape)
            log_q = jnp.sum(_log_gaussian(w, w_mu, w_sigma)) + jnp.sum(
                _log_gaussian(b, b_mu, b_sigma)
            )
            log_p = scale_mixture_log_prob(w) + scale_mixture_log_prob(b)
            kl = log_q - log_p
        else:
            w, b = w_mu, b_mu
            kl = jnp.zeros((), jnp.float32)

        return x @ w + b, kl
