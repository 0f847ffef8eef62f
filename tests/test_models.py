"""Generator/discriminator integration: shapes, output contract, progressive
resolutions, eval semantics (reference t2i_moe_gan.py:668-907)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moegan_tpu.config import DiscriminatorConfig, GeneratorConfig
from moegan_tpu.models import AuroraDiscriminator, AuroraGenerator

TINY16 = GeneratorConfig(
    max_resolution=16, channels={4: 32, 8: 24, 16: 16}, router_hidden=8,
    use_pallas=False, remat_blocks=False,
)
TINY64 = GeneratorConfig(
    max_resolution=64, channels={4: 32, 8: 24, 16: 16, 32: 16, 64: 8},
    router_hidden=8, use_pallas=False, remat_blocks=False,
)


@pytest.fixture(scope="module")
def gen16():
    gen = AuroraGenerator(TINY16)
    k = jax.random.PRNGKey(0)
    z = jax.random.normal(k, (2, 512))
    txt = jax.random.normal(jax.random.fold_in(k, 1), (2, 512))
    params = gen.init({"params": k, "router": k}, z, txt)
    return gen, params, z, txt


def test_generator_16_output_contract(gen16):
    gen, params, z, txt = gen16
    out = gen.apply(params, z, txt, rngs={"router": jax.random.PRNGKey(2)})
    assert out.image.shape == (2, 16, 16, 3)
    assert set(out.intermediates) == {8, 16}  # ref taps to_rgb_8/to_rgb_16
    assert out.intermediates[8].shape == (2, 8, 8, 3)
    assert len(out.routing) == 3  # one per generative block
    assert out.routing[0].shape == (2, 16, 4)  # 4x4 block -> 16 tokens
    assert float(out.kl) > 0.0
    assert np.isfinite(np.asarray(out.image)).all()


def test_generator_64_progressive_ladder():
    gen = AuroraGenerator(TINY64)
    k = jax.random.PRNGKey(0)
    z = jax.random.normal(k, (1, 512))
    txt = jax.random.normal(k, (1, 512))
    params = gen.init({"params": k, "router": k}, z, txt)
    out = gen.apply(params, z, txt, training=False)
    assert out.image.shape == (1, 64, 64, 3)
    assert set(out.intermediates) == {8, 16, 32, 64}
    assert len(out.routing) == 5
    assert float(out.kl) == 0.0  # eval mode


def test_eval_deterministic_and_truncation(gen16):
    gen, params, z, txt = gen16
    a = gen.apply(params, z, txt, truncation_psi=0.7, training=False)
    b = gen.apply(params, z, txt, truncation_psi=0.7, training=False)
    np.testing.assert_array_equal(np.asarray(a.image), np.asarray(b.image))
    c = gen.apply(params, z, txt, truncation_psi=1.0, training=False)
    assert not np.allclose(np.asarray(a.image), np.asarray(c.image))


def test_single_text_embedding_broadcasts(gen16):
    gen, params, z, txt = gen16
    out = gen.apply(params, z, txt[:1], training=False)
    assert out.image.shape == (2, 16, 16, 3)


@pytest.mark.parametrize("res,plan", [(16, (128, 256)), (64, (64, 128, 256, 256))])
def test_discriminator_resolutions(res, plan):
    cfg = DiscriminatorConfig(max_resolution=res)
    assert tuple(cfg.channel_plan()) == plan
    disc = AuroraDiscriminator(cfg)
    k = jax.random.PRNGKey(0)
    img = jax.random.normal(k, (2, res, res, 3))
    txt = jax.random.normal(k, (2, 512))
    params = disc.init(k, img, txt)
    logits = disc.apply(params, img, txt)
    assert logits.shape == (2,)
    assert logits.dtype == jnp.float32
    assert np.isfinite(np.asarray(logits)).all()


def test_discriminator_depends_on_text():
    cfg = DiscriminatorConfig(max_resolution=16)
    disc = AuroraDiscriminator(cfg)
    k = jax.random.PRNGKey(0)
    img = jax.random.normal(k, (2, 16, 16, 3))
    t1 = jax.random.normal(jax.random.fold_in(k, 1), (2, 512))
    t2 = jax.random.normal(jax.random.fold_in(k, 2), (2, 512))
    params = disc.init(k, img, t1)
    assert not np.allclose(
        np.asarray(disc.apply(params, img, t1)), np.asarray(disc.apply(params, img, t2))
    )
