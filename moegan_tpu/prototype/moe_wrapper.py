"""MixtureOfExperts wrapper with textual expert descriptions.

Reference: moe/moe_model.py:448-538. Gating-network-only MoE (the experts
are placeholders in Part A) with human-readable expert descriptions and a
describe_selection() report combining HMC mean probabilities with their
uncertainties.
"""

from __future__ import annotations

import jax
import numpy as np

from moegan_tpu.prototype.gating import (
    BayesianMoEGatingNetwork,
    hamiltonian_monte_carlo,
    predict_expert,
)

EXPERT_DESCRIPTIONS = [
    "General Expert for all categories",
    "Expert for natural landscapes",
    "Expert for portraits and people",
    "Expert for urban environments",
    "Expert for animals and wildlife",
    "Expert for abstract concepts and styles",
    "Expert for indoor scenes and objects",
    "Expert for transportation and vehicles",
    "Expert for weather and atmospheric conditions",
]


class MixtureOfExperts:
    """Stateful convenience wrapper around the gating network + params."""

    def __init__(self, input_dim: int, hidden_dim: int, num_experts: int, seed: int = 0,
                 num_samples: int = 75, burn_in: int = 200):
        self.gating = BayesianMoEGatingNetwork(
            hidden_dim=hidden_dim, num_experts=num_experts, num_samples=num_samples
        )
        self.num_experts = num_experts
        self.num_samples = num_samples
        self.burn_in = burn_in
        self.expert_descriptions = EXPERT_DESCRIPTIONS[:num_experts]
        key = jax.random.PRNGKey(seed)
        import jax.numpy as jnp

        self.params = self.gating.init(
            {"params": key, "router": key}, jnp.zeros((1, input_dim))
        )
        self._rng = jax.random.PRNGKey(seed + 1)

    def _next_rng(self):
        self._rng, k = jax.random.split(self._rng)
        return k

    def __call__(self, text_embedding):
        """Returns (expert_probs, selected_experts, uncertainty)."""
        probs, _, _ = self.gating.apply(
            self.params, text_embedding, sample=True,
            rngs={"router": self._next_rng()},
        )
        selected, mean_probs, uncertainty = predict_expert(
            self.gating, self.params, text_embedding, self._next_rng(),
            num_samples=self.num_samples, burn_in=self.burn_in,
        )
        return probs, selected, mean_probs, uncertainty

    def describe_selection(self, text_embedding) -> str:
        _, selected, mean_probs, uncertainty = self(text_embedding)
        mp = np.asarray(mean_probs)
        unc = np.asarray(uncertainty)
        lines = ["Expert selection:"]
        for i in range(self.num_experts):
            lines.append(
                f"- {self.expert_descriptions[i]}: {mp[0, i]:.4f} "
                f"(uncertainty: {unc[0, i]:.4f})"
            )
        lines.append("")
        lines.append("Selected experts:")
        for idx in selected:
            lines.append(f"- {self.expert_descriptions[idx]}")
        return "\n".join(lines)
