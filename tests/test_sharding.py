"""Multi-device tests on the 8-CPU mesh: sharding placement, sharded step
execution, single-vs-multi-device numerical agreement, dryrun contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from moegan_tpu.config import MeshConfig, TrainConfig
from moegan_tpu.parallel.api import setup_distributed_training, shard_batch
from moegan_tpu.parallel.mesh import auto_expert_parallelism, create_mesh
from tests.helpers import TINY_DISC, TINY_GEN

CFG = TrainConfig(
    generator=TINY_GEN, discriminator=TINY_DISC,
    mesh=MeshConfig(expert_parallelism=4), steps_per_epoch=10,
)
SCHED = {"temperature_factor": jnp.float32(3.0), "effective_kl_weight": jnp.float32(1e-8)}


def _batch(key, n=8):
    return {
        "image": jnp.tanh(jax.random.normal(key, (n, 16, 16, 3))),
        "text": jax.random.normal(key, (n, 512)),
    }


def test_mesh_shapes():
    assert len(jax.devices()) == 8
    mesh = create_mesh(jax.devices(), expert_parallelism=4)
    assert mesh.shape == {"data": 2, "expert": 4}
    assert auto_expert_parallelism(8, 4) == 4
    assert auto_expert_parallelism(6, 4) == 2
    assert auto_expert_parallelism(1, 4) == 1
    with pytest.raises(ValueError):
        create_mesh(jax.devices(), expert_parallelism=3)


@pytest.fixture(scope="module")
def dist():
    key = jax.random.PRNGKey(0)
    mesh, state, step_fn = setup_distributed_training(CFG, key, with_clip=False)
    return mesh, state, step_fn, key


def test_param_placement(dist):
    mesh, state, _, _ = dist
    moe_w1 = state.g_params["gen_block_8"]["attn_block"]["moe"]["w1"]
    assert moe_w1.sharding.spec == P("expert", None, None)
    # one expert shard per expert-axis device
    assert moe_w1.sharding.shard_shape(moe_w1.shape)[0] == 1
    assert state.g_params["mapping_0"]["kernel"].sharding.spec == P()
    # adamw moments inherit the expert sharding
    mu = jax.tree_util.tree_leaves(state.g_opt_state)
    # at least one optimizer leaf carries the expert spec
    specs = {str(l.sharding.spec) for l in mu if hasattr(l, "sharding")}
    assert any("expert" in s for s in specs)


def test_sharded_step_runs_and_is_finite(dist):
    mesh, state, step_fn, key = dist
    batch = _batch(key)
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(1), SCHED)
    for k, v in metrics.items():
        assert np.isfinite(np.asarray(v)).all(), k


def test_batch_sharding(dist):
    mesh, *_ = dist
    b = shard_batch(_batch(jax.random.PRNGKey(0)), mesh)
    assert b["image"].sharding.spec == P("data", None, None, None)


def test_prefetch_lands_sharded_and_shard_batch_is_noop(dist):
    """The prefetcher must place batches with their final mesh sharding in
    one device_put; shard_batch must then pass them through untouched."""
    from moegan_tpu.data.loader import prefetch_to_device
    from moegan_tpu.parallel.sharding import batch_sharding

    mesh, *_ = dist
    host_batches = [
        {k: np.asarray(v) for k, v in _batch(jax.random.PRNGKey(i)).items()}
        for i in range(3)
    ]
    seen = 0
    for b in prefetch_to_device(iter(host_batches), size=2, sharding=batch_sharding(mesh)):
        assert b["image"].sharding.spec == P("data", None, None, None)
        assert b["text"].sharding.spec == P("data", None)
        again = shard_batch(b, mesh)
        assert again["image"] is b["image"]  # no second device_put
        assert again["text"] is b["text"]
        seen += 1
    assert seen == 3


def test_multi_device_matches_single_device():
    """Same seed, same batch: the 2x4 mesh must reproduce single-device
    results (GSPMD partitioning is numerics-preserving for this graph up
    to reduction order)."""
    from moegan_tpu.train.state import create_train_state
    from moegan_tpu.train.step import make_train_step

    key = jax.random.PRNGKey(7)
    batch = _batch(key)

    sd_state = create_train_state(CFG, key)
    sd_step, _ = make_train_step(CFG, 10, with_clip=False)
    sd_state, sd_m = sd_step(sd_state, batch, jax.random.PRNGKey(3), SCHED)

    mesh, md_state, md_step = setup_distributed_training(CFG, key, with_clip=False)
    md_state, md_m = md_step(md_state, batch, jax.random.PRNGKey(3), SCHED)

    for name in ("d_loss", "g_loss", "r1_loss", "kl_loss"):
        np.testing.assert_allclose(
            float(sd_m[name]), float(md_m[name]), rtol=2e-3, atol=1e-4
        )


def test_sharded_fused_moe_matches_einsum():
    """SparseMoE's expert-sharded shard_map path (use_pallas=True under an
    expert>1 mesh; XLA-reference kernel body on CPU) must reproduce the
    einsum GSPMD path — forward, probs, and gradients."""
    from moegan_tpu.core.moe import SparseMoE

    mesh = create_mesh(jax.devices(), expert_parallelism=4)
    kwargs = dict(dim=16, text_dim=12, num_experts=4, router_hidden=8,
                  compute_dtype=jnp.float32)
    m_ein = SparseMoE(use_pallas=False, **kwargs)
    m_sharded = SparseMoE(use_pallas=True, **kwargs)

    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (4, 64, 16))
    w = jax.random.normal(jax.random.fold_in(k, 1), (4, 12))
    params = m_ein.init({"params": k, "router": k}, x, w)

    def run(mod, p, training):
        def f(p, x, w):
            out, kl, probs = mod.apply(
                p, x, w, training=training,
                rngs={"router": jax.random.PRNGKey(5)} if training else {},
            )
            return out, kl, probs

        return jax.jit(f)(p, x, w)

    with jax.sharding.set_mesh(mesh):
        for training in (False, True):
            o1, kl1, p1 = run(m_ein, params, training)
            o2, kl2, p2 = run(m_sharded, params, training)
            np.testing.assert_allclose(
                np.asarray(p1), np.asarray(p2), rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(
                np.asarray(o1), np.asarray(o2), rtol=1e-4, atol=1e-5,
                err_msg=f"training={training}")
            np.testing.assert_allclose(float(kl1), float(kl2), rtol=1e-6)

        # gradient parity through both paths
        def loss(mod):
            def f(p):
                out, kl, probs = mod.apply(
                    p, x, w, training=True, rngs={"router": jax.random.PRNGKey(5)}
                )
                return jnp.sum(out ** 2) + 0.1 * jnp.sum(probs ** 2) + 1e-4 * kl

            return jax.jit(jax.grad(f))(params)

        g1 = loss(m_ein)
        g2 = loss(m_sharded)
        for (ka, a), (kb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(g1), key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_leaves_with_path(g2), key=lambda kv: str(kv[0])),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-5,
                err_msg=str(ka))


def test_sharded_step_with_pallas_flag_keeps_fused_path():
    """The full sharded G+D step must run with use_pallas=True (the
    round-2 override that silently disabled the kernel is gone)."""
    cfg = CFG.replace(generator=TINY_GEN.replace(use_pallas=True))
    key = jax.random.PRNGKey(0)
    mesh, state, step_fn = setup_distributed_training(cfg, key, with_clip=False)
    state, metrics = step_fn(state, _batch(key), jax.random.PRNGKey(1), SCHED)
    for k, v in metrics.items():
        assert np.isfinite(np.asarray(v)).all(), k


def test_sharded_checkpoint_resume_preserves_shardings_and_bits(tmp_path):
    """Orbax save/restore of the SHARDED TrainState: restored params must
    be bitwise identical AND land with their mesh shardings (expert-
    sharded MoE weights stay expert-sharded)."""
    from moegan_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

    key = jax.random.PRNGKey(11)
    mesh, state, step_fn = setup_distributed_training(CFG, key, with_clip=False)
    state, _ = step_fn(state, _batch(key), jax.random.PRNGKey(2), SCHED)
    ckpt_dir = str(tmp_path / "ckpt")
    save_checkpoint(ckpt_dir, state, epoch=3)

    # Fresh skeleton from a DIFFERENT seed: restore must overwrite it.
    _, skeleton, _ = setup_distributed_training(
        CFG, jax.random.PRNGKey(99), with_clip=False
    )
    restored, start_epoch = restore_checkpoint(ckpt_dir, skeleton)
    assert start_epoch == 4
    assert int(restored.step) == int(state.step)

    moe_w1 = restored.g_params["gen_block_8"]["attn_block"]["moe"]["w1"]
    assert moe_w1.sharding.spec == P("expert", None, None)
    assert moe_w1.sharding.shard_shape(moe_w1.shape)[0] == 1

    def norm(arr):  # trailing Nones are semantically absent
        s = tuple(arr.sharding.spec)
        return s + (None,) * (arr.ndim - len(s))

    # Bits must match the SAVED state; shardings must match the SKELETON
    # (the canonical placement restore targets — the post-step state may
    # carry GSPMD-chosen reshards of tiny replicated params).
    for (pa, a), (_, b), (_, sk) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(state.g_params), key=lambda kv: str(kv[0])),
        sorted(jax.tree_util.tree_leaves_with_path(restored.g_params), key=lambda kv: str(kv[0])),
        sorted(jax.tree_util.tree_leaves_with_path(skeleton.g_params), key=lambda kv: str(kv[0])),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(pa))
        assert norm(b) == norm(sk), pa

    # the restored state must be directly usable by the sharded step
    _, metrics = step_fn(restored, _batch(jax.random.PRNGKey(5)), jax.random.PRNGKey(6), SCHED)
    assert np.isfinite(float(metrics["d_loss"]))


def test_dryrun_contract():
    import importlib.util

    spec = importlib.util.spec_from_file_location("graft_entry", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)  # must not raise
