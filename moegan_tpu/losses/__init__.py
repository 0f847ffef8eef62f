from moegan_tpu.losses.gan import (
    generator_loss,
    discriminator_loss,
    r1_penalty,
    moe_balance_loss,
    kl_annealing_factor,
    temperature_factor,
)
from moegan_tpu.losses.clip_loss import clip_loss

__all__ = [
    "generator_loss",
    "discriminator_loss",
    "r1_penalty",
    "moe_balance_loss",
    "kl_annealing_factor",
    "temperature_factor",
    "clip_loss",
]
