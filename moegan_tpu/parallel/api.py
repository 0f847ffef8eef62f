"""High-level distributed training entry points.

New TPU-native capability (the reference is strictly single-device,
SURVEY.md §2.8): data-parallel batches + expert-sharded MoE weights over a
(data, expert) mesh, with XLA inserting the psum/all-gather collectives
over ICI from the sharding annotations (GSPMD). The same jitted train step
runs on one chip, on the CPU test mesh, and on a v5e-8.
"""

from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from moegan_tpu.config import TrainConfig
from moegan_tpu.parallel.mesh import auto_expert_parallelism, create_mesh
from moegan_tpu.train.state import create_train_state
from moegan_tpu.train.step import make_train_step


def shard_batch(batch, mesh, data_axis: str = "data"):
    """Place a host batch onto the mesh, leading axis over 'data'.

    Already-placed arrays (e.g. from the sharded prefetcher) pass through
    untouched, so the hot path does exactly one device_put per batch.
    """
    def put(x):
        sharding = NamedSharding(mesh, P(data_axis, *([None] * (x.ndim - 1))))
        if isinstance(x, jax.Array) and x.sharding == sharding:
            return x
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def setup_distributed_training(
    cfg: TrainConfig,
    rng: jax.Array,
    *,
    devices=None,
    steps_per_epoch: int | None = None,
    with_clip: bool = True,
):
    """Build (mesh, sharded_state, step_fn) for multi-chip training.

    The expert axis size is the largest divisor of both the device count
    and num_experts unless pinned by cfg.mesh.expert_parallelism.
    """
    devices = devices if devices is not None else jax.devices()
    ep = cfg.mesh.expert_parallelism
    if ep <= 0:
        ep = auto_expert_parallelism(len(devices), cfg.generator.num_experts)
    mesh = create_mesh(
        devices,
        expert_parallelism=ep,
        data_axis=cfg.mesh.data_axis,
        expert_axis=cfg.mesh.expert_axis,
    )
    # use_pallas stays on under expert sharding: SparseMoE detects the
    # ambient expert axis and switches to the shard_map'd probs-as-input
    # kernel (core/moe.py:_fused_sharded) — router in XLA, per-chip local
    # expert FFN in Pallas, psum combine over ICI.
    with jax.sharding.set_mesh(mesh):
        state = create_train_state(cfg, rng, mesh=mesh)
    step_fn, txs = make_train_step(cfg, steps_per_epoch, with_clip=with_clip)

    def sharded_step(state, batch, step_rng, schedule, clip_params=None):
        batch = shard_batch(batch, mesh, cfg.mesh.data_axis)
        with jax.sharding.set_mesh(mesh):
            return step_fn(state, batch, step_rng, schedule, clip_params)

    return mesh, state, sharded_step
