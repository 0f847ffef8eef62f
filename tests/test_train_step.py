"""Train-step integration: losses improve, NaN batches are skipped,
stepping is deterministic given the same rng (reference hot loop
t2i_moe_gan.py:1214-1495)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moegan_tpu.config import DiscriminatorConfig, GeneratorConfig, TrainConfig
from moegan_tpu.train import create_train_state, make_train_step
from moegan_tpu.train.state import count_params

CFG = TrainConfig(
    generator=GeneratorConfig(
        max_resolution=16, channels={4: 32, 8: 24, 16: 16}, router_hidden=8,
        use_pallas=False,
    ),
    discriminator=DiscriminatorConfig(max_resolution=16),
    steps_per_epoch=20,
    lr=1e-3,
)
SCHED = {"temperature_factor": jnp.float32(3.0), "effective_kl_weight": jnp.float32(1e-8)}


@pytest.fixture(scope="module")
def setup():
    # NOTE: the train step donates its input state, so every test builds a
    # fresh state (init is jit-cached after the first call).
    key = jax.random.PRNGKey(0)
    step_fn, _ = make_train_step(CFG, 20, with_clip=False)
    batch = {
        "image": jnp.tanh(jax.random.normal(key, (4, 16, 16, 3))),
        "text": jax.random.normal(key, (4, 512)),
    }
    return step_fn, batch, key


def test_d_learns_on_fixed_batch(setup):
    step_fn, batch, key = setup
    state = create_train_state(CFG, key)
    first = None
    for i in range(25):
        state, m = step_fn(state, batch, jax.random.fold_in(key, i), SCHED)
        if i == 0:
            first = float(m["d_loss"])
    assert float(m["d_loss"]) < first
    for name in ("g_loss", "r1_loss", "kl_loss", "balance_loss"):
        assert np.isfinite(float(m[name])), name
    util = np.asarray(m["expert_util"])
    # Per-block utilization [num_blocks, E]; each block's row sums to 1.
    assert util.shape == (3, 4)
    np.testing.assert_allclose(util.sum(axis=-1), 1.0, atol=1e-3)


def test_shared_fake_speed_mode(setup):
    """shared_fake=True (opt-in speed mode) runs ONE generator forward
    per step and feeds D stop_gradient(fake); the default (False)
    regenerates the fake per phase with an independent Bayesian weight
    sample, reproducing the reference exactly (:1292/:1358). Both modes
    must train; the convergence A/B that made False the default lives in
    runs/shared_fake_ab/ab_summary.json."""
    _, batch, key = setup
    import dataclasses

    cfg2 = dataclasses.replace(CFG, shared_fake=True)
    step2, _ = make_train_step(cfg2, 20, with_clip=False)
    state = create_train_state(cfg2, key)
    first = None
    for i in range(12):
        state, m = step2(state, batch, jax.random.fold_in(key, i), SCHED)
        if i == 0:
            first = float(m["d_loss"])
    assert float(m["d_loss"]) < first
    assert np.isfinite(float(m["g_total"]))


def test_nan_batch_does_not_poison_params(setup):
    step_fn, batch, key = setup
    state = create_train_state(CFG, jax.random.PRNGKey(1))
    bad = {"image": batch["image"].at[0, 0, 0, 0].set(jnp.nan), "text": batch["text"]}
    state, _ = step_fn(state, bad, key, SCHED)
    for p in jax.tree_util.tree_leaves(state.g_params):
        assert bool(jnp.isfinite(p).all())
    for p in jax.tree_util.tree_leaves(state.d_params):
        assert bool(jnp.isfinite(p).all())


def test_step_deterministic_given_rng(setup):
    step_fn, batch, key = setup
    s1 = create_train_state(CFG, jax.random.PRNGKey(2))
    s2 = create_train_state(CFG, jax.random.PRNGKey(2))
    s1, m1 = step_fn(s1, batch, jax.random.PRNGKey(9), SCHED)
    s2, m2 = step_fn(s2, batch, jax.random.PRNGKey(9), SCHED)
    assert float(m1["g_total"]) == float(m2["g_total"])
    leaves1 = jax.tree_util.tree_leaves(s1.g_params)
    leaves2 = jax.tree_util.tree_leaves(s2.g_params)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_param_counts_nontrivial():
    state = create_train_state(CFG, jax.random.PRNGKey(3))
    assert count_params(state.g_params) > 1e5
    assert count_params(state.d_params) > 1e5
