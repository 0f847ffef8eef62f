"""Shared tiny configs/fixtures for fast CPU tests."""

import jax

from moegan_tpu.config import DiscriminatorConfig, GeneratorConfig, TrainConfig

TINY_GEN = GeneratorConfig(
    max_resolution=16, channels={4: 32, 8: 24, 16: 16}, router_hidden=8,
    use_pallas=False, remat_blocks=False,
)
TINY_DISC = DiscriminatorConfig(max_resolution=16)
TINY_TRAIN = TrainConfig(
    generator=TINY_GEN, discriminator=TINY_DISC, steps_per_epoch=10,
    batch_size=4, num_epochs=1,
)


def tiny_generator_params(seed: int = 0):
    import jax.numpy as jnp

    from moegan_tpu.models.generator import AuroraGenerator

    gen = AuroraGenerator(TINY_GEN)
    k = jax.random.PRNGKey(seed)
    z = jnp.zeros((1, 512))
    txt = jnp.zeros((1, 512))
    return gen.init({"params": k, "router": k}, z, txt)["params"]
