"""Progressive multi-resolution training (BASELINE config 4), hinge-loss
regime (config 3), and dense 1-expert operation (config 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moegan_tpu.config import (
    DiscriminatorConfig,
    GeneratorConfig,
    LossConfig,
    MeshConfig,
    TrainConfig,
)
from moegan_tpu.data.datasets import synthetic_dataset
from moegan_tpu.train.progressive import (
    resize_dataset,
    stage_config,
    train_progressive,
    transfer_params,
)

TINY_CH = {4: 32, 8: 24, 16: 16, 32: 16, 64: 8}
CFG = TrainConfig(
    generator=GeneratorConfig(max_resolution=32, channels=TINY_CH,
                              router_hidden=8, use_pallas=False),
    discriminator=DiscriminatorConfig(max_resolution=32),
    mesh=MeshConfig(expert_parallelism=4),
    batch_size=8, log_interval=100,
)


def test_transfer_params_copies_matching_paths():
    from moegan_tpu.train.state import create_train_state

    key = jax.random.PRNGKey(0)
    s16 = create_train_state(stage_config(CFG, 16, 1), key)
    s32 = create_train_state(stage_config(CFG, 32, 1), jax.random.PRNGKey(1))
    grafted, copied = transfer_params(s16.g_params, s32.g_params)
    assert copied > 50  # mapping, text proj, constant, blocks 4/8/16, taps
    np.testing.assert_array_equal(
        np.asarray(grafted["mapping_0"]["kernel"]),
        np.asarray(s16.g_params["mapping_0"]["kernel"]),
    )
    np.testing.assert_array_equal(
        np.asarray(grafted["gen_block_8"]["attn_block"]["moe"]["w1"]),
        np.asarray(s16.g_params["gen_block_8"]["attn_block"]["moe"]["w1"]),
    )
    # the new 32-res block stays freshly initialized
    np.testing.assert_array_equal(
        np.asarray(grafted["gen_block_32"]["attn_block"]["moe"]["w1"]),
        np.asarray(s32.g_params["gen_block_32"]["attn_block"]["moe"]["w1"]),
    )


def test_resize_dataset():
    ds = synthetic_dataset(8, 32)
    small = resize_dataset(ds, 16)
    assert small.images.shape == (8, 16, 16, 3)
    np.testing.assert_array_equal(small.text_embeddings, ds.text_embeddings)
    assert resize_dataset(ds, 32) is ds


def test_progressive_two_stages_end_to_end():
    ds = synthetic_dataset(16, 32)
    state, stage_states = train_progressive(
        ds, None, cfg=CFG, stages=((16, 1), (32, 1)),
    )
    assert [r for r, _ in stage_states] == [16, 32]
    # final state is the 32-res model and trained (step advanced)
    assert int(state.step) == 16 // 8
    assert "gen_block_32" in state.g_params
    for p in jax.tree_util.tree_leaves(state.g_params):
        assert bool(jnp.isfinite(p).all())


def test_hinge_loss_regime():
    from moegan_tpu.losses.gan import discriminator_loss, generator_loss

    rp = jnp.asarray([2.0, -0.5])
    fp = jnp.asarray([-2.0, 0.5])
    mp = jnp.asarray([0.0, 0.0])
    d = float(discriminator_loss(rp, fp, mp, "hinge"))
    # relu(1-2)+relu(1.5) /2 ... manual: real: (0+1.5)/2=0.75; fake: (0+1.5)/2=0.75; mism: 1.0
    assert d == pytest.approx(0.75 + 0.75 + 1.0)
    assert float(generator_loss(fp, "hinge")) == pytest.approx(0.75)

    # wired through the train step
    from moegan_tpu.train.state import create_train_state
    from moegan_tpu.train.step import make_train_step

    cfg = stage_config(CFG, 16, 1).replace(loss=LossConfig(gan_loss="hinge"))
    key = jax.random.PRNGKey(0)
    state = create_train_state(cfg, key)
    step, _ = make_train_step(cfg, 10, with_clip=False)
    batch = {"image": jnp.tanh(jax.random.normal(key, (8, 16, 16, 3))),
             "text": jax.random.normal(key, (8, 512))}
    sched = {"temperature_factor": jnp.float32(3.0), "effective_kl_weight": jnp.float32(1e-8)}
    state, m = step(state, batch, key, sched)
    assert np.isfinite(float(m["d_loss"])) and np.isfinite(float(m["g_loss"]))


def test_dense_single_expert_config():
    """BASELINE config 1: dense 1-expert generator inference."""
    gcfg = GeneratorConfig(max_resolution=16, channels={4: 32, 8: 24, 16: 16},
                           num_experts=1, router_hidden=8, use_pallas=False)
    from moegan_tpu.models.generator import AuroraGenerator

    gen = AuroraGenerator(gcfg)
    key = jax.random.PRNGKey(0)
    z = jax.random.normal(key, (2, 512))
    txt = jax.random.normal(key, (2, 512))
    params = gen.init({"params": key, "router": key}, z, txt)["params"]
    out = gen.apply({"params": params}, z, txt, training=False)
    assert out.image.shape == (2, 16, 16, 3)
    # single expert -> routing probs are identically 1
    np.testing.assert_allclose(np.asarray(out.routing[-1]), 1.0)
