"""Bayesian MoE gating network with HMC uncertainty estimation.

Reference: moe/moe_model.py:126-446. Six stacked BayesianLinears with ReLU
(:157-167), optional Aurora-style text conditioning by elementwise multiply
of a projected text embedding after layer 1 (:371-377), and Hamiltonian
Monte Carlo over the INPUT embedding (:169-331): leapfrog integration of
x against the potential KL(softmax(logits(x)/T) || softmax(logits0/T)),
Metropolis acceptance, expert-probability samples -> (mean, std).

The JAX version runs the whole chain as one lax.scan (burn_in + samples
iterations), with the leapfrog gradient from jax.grad — no Python loop,
one compilation, massively faster than the reference's 75x15 sequential
autograd calls.
"""

from __future__ import annotations


import flax.linen as nn
import jax
import jax.numpy as jnp

from moegan_tpu.prototype.bayesian import BayesianLinear


class BayesianMoEGatingNetwork(nn.Module):
    hidden_dim: int
    num_experts: int
    use_text: bool = False
    num_samples: int = 75  # ref :132

    @nn.compact
    def __call__(self, x, text_embedding=None, sample: bool = True):
        """Returns (expert_probs, kl, logits)."""
        kl = jnp.zeros((), jnp.float32)

        x, k = BayesianLinear(self.hidden_dim, name="layer1")(x, sample)
        x = nn.relu(x)
        kl += k

        if self.use_text and text_embedding is not None:
            tfeat = nn.Dense(self.hidden_dim, name="text_projection")(text_embedding)
            x = x * tfeat  # elementwise conditioning (ref :377)

        for name in ("layer2", "layer2a", "layer2b", "layer2c"):
            x, k = BayesianLinear(self.hidden_dim, name=name)(x, sample)
            x = nn.relu(x)
            kl += k

        logits, k = BayesianLinear(self.num_experts, name="layer3")(x, sample)
        kl += k
        return jax.nn.softmax(logits, axis=-1), kl, logits


def hamiltonian_monte_carlo(
    gating: BayesianMoEGatingNetwork,
    params,
    x: jax.Array,
    rng: jax.Array,
    *,
    num_samples: int = 75,
    step_size: float = 0.003,
    num_steps: int = 15,
    burn_in: int = 200,
    temperature: float = 1.3,
):
    """HMC over the input embedding (ref :169-331).

    Returns (mean_probs, uncertainty, acceptance_rate).
    """

    def probs_logits(x_in, key):
        return gating.apply(params, x_in, sample=True, rngs={"router": key})

    # Reference point: deterministic forward (sample=False).
    _, _, logits0 = gating.apply(params, x, sample=False)
    ref = jax.nn.softmax(logits0 / temperature, axis=-1)

    def potential(x_in, key):
        _, _, logits = probs_logits(x_in, key)
        logp = jax.nn.log_softmax(logits / temperature, axis=-1)
        # KL(proposed || reference), summed — F.kl_div(log_input, target)
        return jnp.sum(ref * (jnp.log(ref + 1e-30) - logp))

    grad_u = jax.grad(potential)

    def chain_step(carry, key):
        x_cur = carry
        k_mom, k_eps1, k_eps2, k_eps3, k_acc, k_cur = jax.random.split(key, 6)
        momentum0 = jax.random.normal(k_mom, x_cur.shape)

        # Leapfrog (half-step, full steps, half-step).
        g = grad_u(x_cur, k_eps1)
        mom = momentum0 - 0.5 * step_size * g

        def leap(i, state):
            x_p, mom = state
            x_p = x_p + step_size * mom
            g = grad_u(x_p, k_eps2)
            mom = mom - jnp.where(i < num_steps - 1, 1.0, 0.5) * step_size * g
            return (x_p, mom)

        x_prop, mom = jax.lax.fori_loop(0, num_steps, leap, (x_cur, mom))

        u_prop = potential(x_prop, k_eps3)
        u_cur = potential(x_cur, k_eps3)
        ke0 = 0.5 * jnp.sum(momentum0**2)
        ke1 = 0.5 * jnp.sum(mom**2)
        delta_h = (u_prop + ke1) - (u_cur + ke0)
        accept = (delta_h < 0) | (
            jax.random.uniform(k_acc) < jnp.exp(-jnp.minimum(delta_h, 50.0))
        )

        x_next = jnp.where(accept, x_prop, x_cur)
        probs, _, _ = probs_logits(x_next, k_cur)
        return x_next, (probs, accept.astype(jnp.float32))

    keys = jax.random.split(rng, num_samples + burn_in)
    _, (all_probs, accepts) = jax.lax.scan(chain_step, x, keys)

    kept = all_probs[burn_in:]
    mean_probs = jnp.mean(kept, axis=0)
    uncertainty = jnp.std(kept, axis=0)
    return mean_probs, uncertainty, jnp.mean(accepts)


def predict_expert(
    gating, params, text_embedding, rng, *, threshold: float = 0.7,
    num_samples: int = 75, burn_in: int = 200, step_size: float = 0.003,
):
    """Expert selection with confidence threshold (ref :414-446):
    experts above threshold, else the argmax. Returns
    (selected_experts, mean_probs, uncertainty)."""
    mean_probs, uncertainty, _ = hamiltonian_monte_carlo(
        gating, params, text_embedding, rng,
        num_samples=num_samples, burn_in=burn_in, step_size=step_size,
    )
    import numpy as np

    mp = np.asarray(mean_probs)
    selected = [i for i in range(mp.shape[-1]) if mp[0, i] > threshold]
    if not selected:
        selected = [int(mp[0].argmax())]
    return selected, mean_probs, uncertainty
