"""Learning-rate schedule: linear warmup 10%% -> 100%% then cosine to 5%%.

Reference: warmup at t2i_moe_gan.py:1149-1161 (per-epoch linear from 0.1x
to 1.0x over lr_warmup_epochs), then CosineAnnealingLR with eta_min =
0.05*lr over the remaining epochs (:1108-1118, :1514-1516). We evaluate the
same curve per-step (epoch granularity in the reference; per-step is the
smoother jit-friendly equivalent with identical endpoints).
"""

from __future__ import annotations

import optax


def warmup_cosine(
    lr: float,
    num_epochs: int,
    steps_per_epoch: int,
    warmup_epochs: int,
    min_fraction: float = 0.05,
):
    warmup_steps = max(1, warmup_epochs * steps_per_epoch)
    total_steps = max(warmup_steps + 1, num_epochs * steps_per_epoch)
    warmup = optax.linear_schedule(0.1 * lr, lr, warmup_steps)
    cosine = optax.cosine_decay_schedule(
        lr, total_steps - warmup_steps, alpha=min_fraction
    )
    return optax.join_schedules([warmup, cosine], [warmup_steps])
