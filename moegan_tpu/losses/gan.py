"""Adversarial losses, R1 penalty, MoE balance loss, and schedules.

Reference: AuroraGANLoss (t2i_moe_gan.py:909-1000), R1 computation in the
train loop (:1282-1286), KL-annealing / router-temperature schedules
(:1168-1178). All pure functions of arrays — they compose under jit/grad.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def generator_loss(fake_pred: jax.Array, kind: str = "nonsaturating") -> jax.Array:
    """G adversarial loss.

    "nonsaturating": softplus(-D(fake)).mean() (ref :917-924, the default).
    "hinge": -D(fake).mean() (BASELINE.json config 3 regime).
    """
    if kind == "hinge":
        return -jnp.mean(fake_pred)
    return jnp.mean(jax.nn.softplus(-fake_pred))


def discriminator_loss(
    real_pred: jax.Array,
    fake_pred: jax.Array,
    mismatched_pred: jax.Array,
    kind: str = "nonsaturating",
) -> jax.Array:
    """Matching-aware D loss (ref :940-949); hinge variant keeps the
    mismatched-text term with the same fake-side margin."""
    if kind == "hinge":
        return (
            jnp.mean(jax.nn.relu(1.0 - real_pred))
            + jnp.mean(jax.nn.relu(1.0 + fake_pred))
            + jnp.mean(jax.nn.relu(1.0 + mismatched_pred))
        )
    return (
        jnp.mean(jax.nn.softplus(-real_pred))
        + jnp.mean(jax.nn.softplus(fake_pred))
        + jnp.mean(jax.nn.softplus(mismatched_pred))
    )


def r1_penalty(d_apply, real_images: jax.Array, r1_gamma: float) -> jax.Array:
    """R1 gradient penalty: (gamma/2) * E[ ||d D(x)/dx||^2 ].

    ``d_apply`` maps images -> logits [B]. The reference's
    autograd.grad(create_graph=True) double-backward (:1282-1286) is just a
    nested jax.grad here; XLA differentiates through it natively.
    """
    grad_fn = jax.grad(lambda imgs: jnp.sum(d_apply(imgs)))
    grads = grad_fn(real_images)
    penalty = jnp.sum(jnp.square(grads.astype(jnp.float32)), axis=(1, 2, 3))
    return (r1_gamma / 2.0) * jnp.mean(penalty)


def _cv_balance(probs: jax.Array) -> jax.Array:
    """Coefficient-of-variation load balance of one block's routing [.., E]
    (ref :951-1000, Switch-Transformer style). Matches the reference
    numerics: unbiased std (torch.std default), clamp to [0, 10], scale by
    num_experts."""
    p = probs.astype(jnp.float32)
    p = p.reshape(-1, p.shape[-1])  # [N, E]
    eps = 1e-6
    n_items = p.shape[0]
    num_experts = p.shape[-1]

    load = jnp.sum(p, axis=0) + eps
    fraction_routed = load / n_items
    mean_usage = jnp.mean(fraction_routed)
    std_usage = jnp.std(fraction_routed, ddof=1)
    cv = std_usage / (mean_usage + eps)
    balance = jnp.clip(num_experts * cv, 0.0, 10.0)
    return jnp.nan_to_num(balance, nan=0.0)


def _switch_balance(probs: jax.Array) -> jax.Array:
    """Switch-Transformer auxiliary load loss E * sum(f_i * P_i) where
    f_i is the HARD top-1 dispatch fraction (stop-gradient one-hot counts)
    and P_i the mean soft prob. Minimum 1.0 at a uniform assignment.

    Unlike the CV-of-soft-mass term, this penalizes skew in the argmax
    distribution directly — router temperature annealing can hold soft
    probs near-uniform (making CV ~0) while the underlying logits still
    collapse every hard routing decision onto a couple of experts, which
    is exactly what eval-mode (hard top-1) sampling then exposes."""
    p = probs.astype(jnp.float32)
    p = p.reshape(-1, p.shape[-1])  # [N, E]
    num_experts = p.shape[-1]
    hard = jax.nn.one_hot(jnp.argmax(p, axis=-1), num_experts, dtype=jnp.float32)
    f = jax.lax.stop_gradient(jnp.mean(hard, axis=0))
    mean_p = jnp.mean(p, axis=0)
    return num_experts * jnp.sum(f * mean_p)


def moe_balance_loss(
    routing_probs,
    balance_weight: float = 0.01,
    all_blocks: bool = False,
    kind: str = "cv",
) -> jax.Array:
    """Load-balance loss over routing probabilities.

    routing_probs: sequence of [B, T, E] (or [N, E]) arrays. Reference
    parity (all_blocks=False, kind="cv") penalizes only the LAST block's
    routing (ref :951-1000); all_blocks=True averages the term over every
    block so collapse in earlier blocks is also penalized (round-1 demo
    showed block_1 collapsing to 2/4 experts under last-block-only
    balancing). kind="switch" uses the hard-dispatch load loss — see
    _switch_balance for when the CV term is insufficient.
    """
    if not routing_probs:
        return jnp.zeros((), jnp.float32)
    term = _switch_balance if kind == "switch" else _cv_balance
    if all_blocks:
        balance = jnp.mean(jnp.stack([term(p) for p in routing_probs]))
    else:
        balance = term(routing_probs[-1])
    return balance_weight * balance


def kl_annealing_factor(epoch, kl_annealing_epochs: int) -> jax.Array:
    """Quadratic KL warmup from 1e-5 to 1.0 of kl_weight (ref :1170-1174)."""
    warm = jnp.minimum(1.0, (epoch / kl_annealing_epochs) ** 2)
    initial = 1e-5
    return initial + (1.0 - initial) * warm


def temperature_factor(epoch) -> jax.Array:
    """Router temperature annealing: max(1, 3 - 0.1*epoch) (ref :1178)."""
    return jnp.maximum(1.0, 3.0 - 0.1 * epoch)


def expert_utilization(routing_probs) -> jax.Array:
    """Per-expert mean routing mass of the last block — the observability
    signal the reference plots in moe/moe_testing.py:127-177."""
    last = routing_probs[-1].astype(jnp.float32)
    return jnp.mean(last.reshape(-1, last.shape[-1]), axis=0)


def expert_utilization_per_block(routing_probs) -> jax.Array:
    """[num_blocks, E] per-expert mean routing mass for EVERY block, so
    collapse anywhere in the ladder is visible in training logs."""
    return jnp.stack(
        [
            jnp.mean(p.astype(jnp.float32).reshape(-1, p.shape[-1]), axis=0)
            for p in routing_probs
        ]
    )


def expert_top1_per_block(routing_probs) -> jax.Array:
    """[num_blocks, E] HARD top-1 dispatch fractions per block. Soft means
    can read ~uniform under temperature annealing while every argmax lands
    on two experts — this is the signal eval-mode sampling actually uses."""
    out = []
    for p in routing_probs:
        p2 = p.astype(jnp.float32).reshape(-1, p.shape[-1])
        hard = jax.nn.one_hot(jnp.argmax(p2, axis=-1), p2.shape[-1], dtype=jnp.float32)
        out.append(jnp.mean(hard, axis=0))
    return jnp.stack(out)
