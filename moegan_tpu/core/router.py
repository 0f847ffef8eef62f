"""Bayesian variational router with reparameterized weight sampling.

Reference: t2i_moe_gan.py:265-423. Three weight matrices with mean/rho
variational posteriors (feature [C,128], text [512,128], combined
[256,E]); mu ~ N(0, 0.01), rho = -4 at init (:279-293); a learnable
temperature initialized at 4.0 (:301). Training samples weights with
mu + softplus(rho)*eps under heavy clamping (:302-333); inference uses
the means and hard top-1 one-hot routing (:357-361, :391-400). The
closed-form KL to N(0,1) (:405-423) regularizes the posterior.

TPU-native differences:
- The persistent epsilon buffers (:296-298) become explicit PRNG keys
  threaded via flax's rng collections ("router").
- The per-token text input is the per-image style vector broadcast to all
  pixels (SparseMoE does the broadcast at :456); since text_proj is
  per-image constant, we project at [B] granularity and broadcast the
  128-dim projection — mathematically identical, HBM-traffic-free.
- NaN print-guards become jnp.nan_to_num (data-independent control flow).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from moegan_tpu.core import inits


def reparameterize(mu, rho, eps):
    """Numerically stable mu + softplus(rho) * eps with reference clamps."""
    mu = jnp.clip(mu, -10.0, 10.0)
    rho = jnp.clip(rho, -8.0, 4.0)
    sigma = jnp.clip(jnp.log1p(jnp.exp(rho)), 1e-6, 10.0)
    eps = jnp.clip(eps, -2.0, 2.0)
    return mu + sigma * eps


def gaussian_kl(mu, rho):
    """KL(N(mu, softplus(rho)^2) || N(0,1)) in log-variance form (ref :405-423)."""
    sigma = jnp.log1p(jnp.exp(rho.astype(jnp.float32)))
    log_var = 2.0 * jnp.log(sigma)
    kl = 0.5 * jnp.sum(jnp.exp(log_var) + jnp.square(mu.astype(jnp.float32)) - 1.0 - log_var)
    return kl


class BayesianRouter(nn.Module):
    """Routes per-pixel tokens to experts, conditioned on the style vector."""

    feature_dim: int
    text_dim: int
    num_experts: int = 4
    hidden: int = 128

    def setup(self):
        h, e = self.hidden, self.num_experts
        self.feature_mu = self.param("feature_mu", inits.normal(0.01), (self.feature_dim, h))
        self.feature_rho = self.param("feature_rho", inits.constant(-4.0), (self.feature_dim, h))
        self.text_mu = self.param("text_mu", inits.normal(0.01), (self.text_dim, h))
        self.text_rho = self.param("text_rho", inits.constant(-4.0), (self.text_dim, h))
        self.combined_mu = self.param("combined_mu", inits.normal(0.01), (2 * h, e))
        self.combined_rho = self.param("combined_rho", inits.constant(-4.0), (2 * h, e))
        self.temperature = self.param("temperature", inits.constant(4.0), (1,))

    def sample_weights(self, sampling: bool):
        """Sample (or take the mean of) the three router weight matrices."""
        if sampling:
            k1, k2, k3 = jax.random.split(self.make_rng("router"), 3)
            fw = reparameterize(
                self.feature_mu, self.feature_rho, jax.random.normal(k1, self.feature_mu.shape)
            )
            tw = reparameterize(
                self.text_mu, self.text_rho, jax.random.normal(k2, self.text_mu.shape)
            )
            cw = reparameterize(
                self.combined_mu, self.combined_rho, jax.random.normal(k3, self.combined_mu.shape)
            )
        else:
            fw, tw, cw = self.feature_mu, self.text_mu, self.combined_mu
        return fw, tw, cw

    def __call__(
        self,
        feature: jax.Array,  # [B, T, C] per-pixel tokens
        text: jax.Array,  # [B, text_dim] per-image conditioning (style w)
        *,
        sampling: bool = True,
        hard: bool = False,
        annealing_factor: jax.Array | float = 1.0,
    ):
        """Returns (probs [B,T,E], logits [B,T,E]).

        ``hard`` selects the reference's inference-time top-1 one-hot
        routing (:391-400); ``sampling`` the weight-noise sampling (train).
        Router math runs in fp32 for stability (replaces the reference's
        AMP-era NaN guards with a dtype guarantee).
        """
        fw, tw, cw = self.sample_weights(sampling)

        feature = jnp.nan_to_num(feature.astype(jnp.float32), nan=0.0, posinf=1.0, neginf=-1.0)
        text = jnp.nan_to_num(text.astype(jnp.float32), nan=0.0, posinf=1.0, neginf=-1.0)

        h = self.hidden
        feat_proj = feature @ fw  # [B, T, h]
        text_proj = text @ tw  # [B, h] (constant per image)

        # logits = [feat_proj ; text_proj] @ cw, split to avoid the concat.
        logits = feat_proj @ cw[:h] + (text_proj @ cw[h:])[:, None, :]  # [B,T,E]

        eff_temp = jnp.clip(self.temperature[0] * annealing_factor, 0.5, 5.0)
        logits = jnp.clip(logits / eff_temp, -20.0, 20.0)

        probs = jax.nn.softmax(logits, axis=-1)
        probs = jnp.clip(probs, 1e-6, 1.0)
        probs = probs / jnp.sum(probs, axis=-1, keepdims=True)

        if hard:
            top = jnp.argmax(probs, axis=-1)
            probs = jax.nn.one_hot(top, self.num_experts, dtype=probs.dtype)

        return probs, logits

    def kl_divergence(self) -> jax.Array:
        """Closed-form KL of all three posteriors, clamped to [0, 120]."""
        kl = (
            gaussian_kl(self.feature_mu, self.feature_rho)
            + gaussian_kl(self.text_mu, self.text_rho)
            + gaussian_kl(self.combined_mu, self.combined_rho)
        )
        kl = jnp.nan_to_num(kl, nan=0.0, posinf=200.0, neginf=0.0)
        return jnp.clip(kl, 0.0, 120.0)
