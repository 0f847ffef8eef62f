"""moegan_tpu — TPU-native MoE-GAN text-to-image framework.

A ground-up JAX/Flax/optax/Pallas rebuild of the capabilities of the
PyTorch reference (shmurthy08/MoE-GAN_CPSC541): an Aurora-style GAN whose
generator stacks modulated-convolution blocks with learned feature
deformation, self/cross attention, and per-pixel sparse Mixture-of-Experts
FFNs gated by a Bayesian variational router, trained adversarially with
non-saturating + matching-aware losses, R1 gradient penalty, multi-level
CLIP perceptual loss, router-KL and MoE load-balancing regularizers.

Public surface mirrors the reference package exports
(/root/reference/moegan/__init__.py:8) while being idiomatic JAX:

- models: ``AuroraGenerator``, ``AuroraDiscriminator`` (flax.linen modules)
- losses: ``AuroraGANLoss``-equivalent functional losses in ``losses``
- training: ``train_aurora_gan`` in ``train.loop`` (jitted G+D step)
- sampling: ``sample_aurora_gan`` in ``infer.sample``
"""

from moegan_tpu.config import (
    GeneratorConfig,
    DiscriminatorConfig,
    LossConfig,
    TrainConfig,
    MeshConfig,
)
from moegan_tpu.models.generator import AuroraGenerator
from moegan_tpu.models.discriminator import AuroraDiscriminator

__version__ = "0.1.0"

__all__ = [
    "AuroraGenerator",
    "AuroraDiscriminator",
    "GeneratorConfig",
    "DiscriminatorConfig",
    "LossConfig",
    "TrainConfig",
    "MeshConfig",
    "__version__",
]
