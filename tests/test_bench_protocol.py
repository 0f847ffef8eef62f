"""The un-jitted train step must compose under lax.scan (bench.py's
single-dispatch measurement protocol) and agree with the jitted step."""

import jax
import jax.numpy as jnp
import numpy as np

from moegan_tpu.train.state import create_train_state
from moegan_tpu.train.step import make_train_step
from tests.helpers import TINY_TRAIN

SCHED = {"temperature_factor": jnp.float32(3.0), "effective_kl_weight": jnp.float32(1e-8)}


def test_raw_step_scans_and_matches_jitted():
    cfg = TINY_TRAIN
    key = jax.random.PRNGKey(0)
    batch = {
        "image": jnp.tanh(jax.random.normal(key, (4, 16, 16, 3))),
        "text": jax.random.normal(key, (4, 512)),
    }

    raw, _ = make_train_step(cfg, 10, with_clip=False, jit_compile=False)

    @jax.jit
    def multi(state, batch, rng, schedule):
        def body(st, i):
            st, m = raw(st, batch, jax.random.fold_in(rng, i), schedule, None)
            return st, m["d_loss"]

        return jax.lax.scan(body, state, jnp.arange(3))

    state = create_train_state(cfg, key)
    state_s, losses = multi(state, batch, jax.random.PRNGKey(1), SCHED)
    assert losses.shape == (3,)
    assert np.isfinite(np.asarray(losses)).all()

    # step-by-step jitted path produces the same losses
    jitted, _ = make_train_step(cfg, 10, with_clip=False)
    state = create_train_state(cfg, key)
    got = []
    for i in range(3):
        state, m = jitted(state, batch, jax.random.fold_in(jax.random.PRNGKey(1), i), SCHED)
        got.append(float(m["d_loss"]))
    # scanned vs stepwise compilations fuse differently; bf16-scale slack
    np.testing.assert_allclose(np.asarray(losses), got, rtol=2e-3, atol=1e-4)
