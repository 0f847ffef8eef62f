"""train_aurora_gan: the public training loop.

Functional mirror of reference train_aurora_gan (t2i_moe_gan.py:1029-1669):
same hyperparameter surface, per-epoch KL-annealing and router-temperature
schedules, EMA running-loss logging, per-epoch validation with the
metric-callback early-stop protocol, [METRIC] stdout lines for HPO — but
the hot path is ONE jitted G+D step with donated state, batches stream
through a host-overlapped prefetcher, and checkpoints (full resume, an
upgrade over the reference's commented-out saves) go through orbax.
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from moegan_tpu.config import TrainConfig
from moegan_tpu.data.loader import BatchLoader, prefetch_to_device
from moegan_tpu.losses.gan import kl_annealing_factor, temperature_factor
from moegan_tpu.parallel.api import setup_distributed_training, shard_batch
from moegan_tpu.parallel.sharding import batch_sharding
from moegan_tpu.train.state import TrainState, count_params, create_train_state
from moegan_tpu.train.step import make_eval_step, make_train_step
from moegan_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint
from moegan_tpu.utils.metrics import EMAMeter, MetricLogger


def train_aurora_gan(
    dataset,
    val_dataset=None,
    *,
    cfg: TrainConfig = TrainConfig(),
    clip_params=None,
    metric_callback: Optional[Callable[[int, dict], bool]] = None,
    save_dir: Optional[str] = None,
    resume: bool = False,
    distributed: bool = True,
    devices=None,
    logger: Optional[MetricLogger] = None,
    transfer_from=None,
) -> TrainState:
    """Train the Aurora MoE-GAN; returns the final TrainState.

    metric_callback(epoch, val_metrics) -> bool mirrors the reference
    (:1632-1636): returning False stops training early.
    """
    log = logger or MetricLogger()
    loader = BatchLoader(
        dataset, cfg.batch_size, shuffle=True, drop_last=True, seed=cfg.seed
    )
    steps_per_epoch = cfg.steps_per_epoch or loader.steps_per_epoch
    key = jax.random.PRNGKey(cfg.seed)

    if distributed and len(devices or jax.devices()) > 1:
        mesh, state, step_fn = setup_distributed_training(
            cfg, key, devices=devices, steps_per_epoch=steps_per_epoch,
            with_clip=clip_params is not None,
        )
    else:
        mesh = None
        state = create_train_state(cfg, key)
        step_fn, _ = make_train_step(
            cfg, steps_per_epoch, with_clip=clip_params is not None
        )
    if transfer_from is not None:
        # Progressive training: graft matching generator params from the
        # previous (lower-resolution) stage, preserving this stage's
        # shardings by placing each transferred leaf like its skeleton.
        from moegan_tpu.train.progressive import transfer_params

        grafted, copied = transfer_params(transfer_from, state.g_params)
        grafted = jax.tree_util.tree_map(
            lambda new, skel: jax.device_put(jnp.asarray(new), skel.sharding),
            grafted, state.g_params,
        )
        state = state.replace(g_params=grafted)
        log.log_line(f"transferred {copied} generator tensors from the previous stage")

    eval_fn = make_eval_step(cfg, with_clip=clip_params is not None)

    start_epoch = 0
    if resume and save_dir:
        state, start_epoch = restore_checkpoint(save_dir, state)
        if start_epoch:
            log.log_line(f"Resumed from {save_dir} at epoch {start_epoch}")

    log.log_line(
        f"Generator parameters: {count_params(state.g_params):,} | "
        f"Discriminator parameters: {count_params(state.d_params):,}"
    )

    from moegan_tpu.utils.profiling import MemoryMonitor

    mem = MemoryMonitor(interval=max(cfg.log_interval, 1) * 10)
    ema = EMAMeter(0.9)
    step = int(state.step)
    for epoch in range(start_epoch, cfg.num_epochs):
        # Per-epoch schedule scalars (ref :1168-1178).
        eff_kl_w = float(cfg.loss.kl_weight) * float(
            kl_annealing_factor(epoch, cfg.loss.kl_annealing_epochs)
        )
        temp = float(temperature_factor(epoch))
        schedule = {
            "temperature_factor": jnp.float32(temp),
            "effective_kl_weight": jnp.float32(eff_kl_w),
        }
        log.log_line(
            f"Epoch {epoch + 1}/{cfg.num_epochs} | temp_factor={temp:.2f} "
            f"eff_kl_weight={eff_kl_w:.8f}"
        )

        t_epoch = time.time()
        n_imgs = 0
        # Sharded prefetch: the batch lands on the mesh with its final
        # sharding in ONE device_put (shard_batch in the step is then a
        # no-op on already-placed arrays).
        batches = prefetch_to_device(
            loader.epoch(epoch),
            size=2,
            sharding=batch_sharding(mesh, data_axis=cfg.mesh.data_axis)
            if mesh is not None
            else None,
        )
        last_metrics = None
        for batch in batches:
            step_rng = jax.random.fold_in(key, step)
            state, metrics = step_fn(state, batch, step_rng, schedule, clip_params)
            last_metrics = metrics
            n_imgs += cfg.batch_size
            step += 1
            mem.step(step)

            if step % cfg.log_interval == 0:
                host = {
                    k: float(v) for k, v in metrics.items() if getattr(v, "ndim", 1) == 0
                }
                running = ema.update(host)
                log.log_line(
                    f"Step [{step}] Epoch [{epoch + 1}] "
                    + " ".join(f"{k}={v:.4f}" for k, v in sorted(running.items()))
                )

        dt = time.time() - t_epoch
        log.log_metric("train_imgs_per_sec", n_imgs / max(dt, 1e-9), step)
        if last_metrics is not None and "expert_util" in last_metrics:
            # Per-block expert utilization [num_blocks, E] — the collapse
            # signal the scalar log filter used to drop silently.
            log.log_vector("expert_util_per_block", last_metrics["expert_util"], step)
        if last_metrics is not None and "expert_top1" in last_metrics:
            log.log_vector("expert_top1_per_block", last_metrics["expert_top1"], step)

        # ===== validation (ref :1518-1629) =====
        if val_dataset is not None:
            # A val split smaller than batch_size falls back to a smaller
            # val batch instead of silently skipping validation (which
            # would strand the HPO objective); only a truly unusable split
            # (fewer examples than data-parallel shards) skips, loudly.
            val_bs = min(cfg.batch_size, len(val_dataset))
            if mesh is not None:
                dp = mesh.shape[cfg.mesh.data_axis]
                val_bs = (val_bs // dp) * dp
            if val_bs <= 0:
                log.log_line(
                    f"WARNING: validation SKIPPED - val split has "
                    f"{len(val_dataset)} examples, fewer than the "
                    f"data-parallel shard count; no val metrics this epoch"
                )
                val_bs = None
            elif val_bs < cfg.batch_size:
                log.log_line(
                    f"WARNING: val split ({len(val_dataset)}) smaller than "
                    f"batch_size ({cfg.batch_size}); validating with "
                    f"batch_size={val_bs}"
                )
        else:
            val_bs = None
        if val_bs:
            vloader = BatchLoader(
                val_dataset, val_bs, shuffle=False, drop_last=True
            )
            sums: dict[str, float] = {}
            n_val = 0
            for i, vbatch in enumerate(vloader.epoch(0)):
                if mesh is not None:
                    vbatch = shard_batch(vbatch, mesh, cfg.mesh.data_axis)
                # Eval stream folds indices from the top of the uint32 fold
                # space, disjoint from the train-step stream (step >= 0).
                vm = eval_fn(state, vbatch, jax.random.fold_in(key, 0xFFFF_FFFF - i), schedule, clip_params)
                n_val += val_bs
                for k, v in vm.items():
                    sums[k] = sums.get(k, 0.0) + float(v) * val_bs
            val_metrics = {k: v / n_val for k, v in sums.items()}
            log.log_metrics(val_metrics, step)
            if metric_callback is not None:
                if not metric_callback(epoch, val_metrics):
                    log.log_line("Early stopping triggered by metric callback")
                    break

        if save_dir:
            save_checkpoint(save_dir, state, epoch)

    return state
