"""Prototype Bayesian-MoE router package ("Part A" of the reference).

JAX rebuild of /root/reference/moe/: a standalone router-only MoE trained
with pseudo-labels, used to study expert routing + uncertainty before
integrating into the GAN. Components (SURVEY.md §2.4):

- BayesianLinear: Blundell weight-uncertainty Linear with scale-mixture
  Gaussian prior (moe_model.py:7-123)
- BayesianMoEGatingNetwork: 6 stacked BayesianLinears + optional text
  conditioning + Hamiltonian Monte Carlo uncertainty (moe_model.py:126-446)
- MixtureOfExperts wrapper with expert descriptions (moe_model.py:448-538)
- KMeans cluster labeling + supervised router training
  (moe_integration.py)
- manual test harness (moe_testing.py) -> prototype/testing.py
"""

from moegan_tpu.prototype.bayesian import BayesianLinear
from moegan_tpu.prototype.gating import BayesianMoEGatingNetwork
from moegan_tpu.prototype.moe_wrapper import MixtureOfExperts

__all__ = ["BayesianLinear", "BayesianMoEGatingNetwork", "MixtureOfExperts"]
