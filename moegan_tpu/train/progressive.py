"""Progressive multi-resolution training: 16 -> 32 -> 64.

BASELINE.json config 4. The reference *intended* progressive growth (its
create_optimizer_for_active_blocks references 32/64 blocks that were never
built, t2i_moe_gan.py:1005-1026) but shipped fixed-16x16 training. Here
each stage trains at one resolution; when the ladder grows, every
generator parameter whose path exists in the next stage's model (mapping
net, text projection, constant, all lower-resolution blocks and RGB taps)
transfers, and only the new block + its RGB tap start fresh. The
discriminator changes topology with input resolution, so it re-initializes
per stage (the reference's D is also resolution-specific, :858-907).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np

from moegan_tpu.config import TrainConfig
from moegan_tpu.data.datasets import ProcessedMSCOCODataset
from moegan_tpu.train.loop import train_aurora_gan
from moegan_tpu.utils.metrics import MetricLogger

FULL_CHANNELS = {4: 512, 8: 256, 16: 128, 32: 64, 64: 32}


def transfer_params(old: dict, new: dict) -> tuple[dict, int]:
    """Copy every leaf from ``old`` into ``new`` where path+shape match."""
    import flax.traverse_util as tu

    old_flat = tu.flatten_dict(old)
    new_flat = dict(tu.flatten_dict(new))
    copied = 0
    for path, leaf in old_flat.items():
        if path in new_flat and new_flat[path].shape == leaf.shape:
            new_flat[path] = leaf
            copied += 1
    return tu.unflatten_dict(new_flat), copied


def resize_dataset(ds: ProcessedMSCOCODataset, resolution: int) -> ProcessedMSCOCODataset:
    """Area-style downsample of the stored images to the stage resolution."""
    import jax.numpy as jnp

    if ds.images.shape[1] == resolution:
        return ds
    imgs = jax.image.resize(
        jnp.asarray(ds.images),
        (len(ds.images), resolution, resolution, 3),
        method="bilinear",
    )
    return ProcessedMSCOCODataset(np.asarray(imgs), ds.text_embeddings, ds.captions)


def stage_config(cfg: TrainConfig, resolution: int, epochs: int) -> TrainConfig:
    channels = {k: v for k, v in FULL_CHANNELS.items() if k <= resolution}
    if cfg.generator.channels and max(cfg.generator.channels) >= resolution:
        channels = {k: v for k, v in cfg.generator.channels.items() if k <= resolution}
    clip_weights = {k: v for k, v in cfg.loss.clip_weights.items() if k <= resolution}
    return cfg.replace(
        num_epochs=epochs,
        generator=cfg.generator.replace(max_resolution=resolution, channels=channels),
        discriminator=cfg.discriminator.replace(max_resolution=resolution),
        loss=cfg.loss.replace(clip_weights=clip_weights),
    )


def train_progressive(
    dataset,
    val_dataset=None,
    *,
    cfg: TrainConfig = TrainConfig(),
    stages: Sequence[tuple] = ((16, 10), (32, 10), (64, 30)),
    clip_params=None,
    save_dir: Optional[str] = None,
    logger: Optional[MetricLogger] = None,
    metric_callback=None,
):
    """Run the progressive ladder; returns (final_state, stage_states).

    stages: sequence of (resolution, epochs). Generator params transfer
    between consecutive stages; stage artifacts checkpoint under
    save_dir/stage_{r} when save_dir is given.
    """
    log = logger or MetricLogger()
    prev_g_params = None
    stage_states = []
    state = None

    for resolution, epochs in stages:
        scfg = stage_config(cfg, resolution, epochs)
        ds_r = resize_dataset(dataset, resolution)
        val_r = resize_dataset(val_dataset, resolution) if val_dataset is not None else None
        stage_dir = f"{save_dir}/stage_{resolution}" if save_dir else None

        log.log_line(f"=== progressive stage {resolution}x{resolution} "
                     f"({epochs} epochs) ===")

        state = train_aurora_gan(
            ds_r, val_r, cfg=scfg, clip_params=clip_params,
            save_dir=stage_dir, logger=log, metric_callback=metric_callback,
            transfer_from=prev_g_params,
        )
        prev_g_params = state.g_params
        stage_states.append((resolution, state))

    return state, stage_states
