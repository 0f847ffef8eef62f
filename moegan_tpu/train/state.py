"""Training state: G/D params + optimizer states in one donate-able pytree.

Replaces the reference's mutable nn.Module + torch.optim.AdamW pair
(t2i_moe_gan.py:1091-1121) with an immutable pytree updated by a jitted
step. Optimizer = AdamW(weight_decay=0.01, ref :1100-1102) under
global-norm clipping (0.7 D / 0.8 G, ref :1333/:1417) and apply_if_finite
— the functional equivalent of the reference's "NaN in loss -> skip the
step" guard (:1315-1320, :1396-1399).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from moegan_tpu.config import TrainConfig
from moegan_tpu.models.discriminator import AuroraDiscriminator
from moegan_tpu.models.generator import AuroraGenerator
from moegan_tpu.train.schedules import warmup_cosine


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    g_params: Any
    d_params: Any
    g_opt_state: Any
    d_opt_state: Any


def make_optimizers(cfg: TrainConfig, steps_per_epoch: int):
    sched = warmup_cosine(
        cfg.lr, cfg.num_epochs, steps_per_epoch, cfg.lr_warmup_epochs, cfg.lr_min_fraction
    )

    def chain(clip):
        tx = optax.chain(
            optax.clip_by_global_norm(clip),
            optax.adamw(
                sched, b1=cfg.beta1, b2=cfg.beta2, weight_decay=cfg.weight_decay
            ),
        )
        if cfg.gradient_accumulation_steps > 1:
            tx = optax.MultiSteps(tx, cfg.gradient_accumulation_steps)
        return optax.apply_if_finite(tx, max_consecutive_errors=100)

    return chain(cfg.grad_clip_g), chain(cfg.grad_clip_d)


def create_train_state(cfg: TrainConfig, rng: jax.Array, mesh=None) -> TrainState:
    """Initialize G/D params + optimizer states.

    With ``mesh``, parameters are placed according to the partition rules
    (expert-stacked MoE weights over the 'expert' axis, everything else
    replicated) and the optimizer states inherit those shardings by
    jitting the optimizer init with sharded inputs (GSPMD propagation).
    """
    gen = AuroraGenerator(cfg.generator)
    disc = AuroraDiscriminator(cfg.discriminator)

    kg, kd, kr = jax.random.split(rng, 3)
    z = jnp.zeros((1, cfg.generator.latent_dim), jnp.float32)
    txt = jnp.zeros((1, cfg.generator.text_embedding_dim), jnp.float32)
    g_vars = gen.init({"params": kg, "router": kr}, z, txt)
    g_params = g_vars["params"]

    r = cfg.discriminator.max_resolution
    img = jnp.zeros((1, r, r, 3), jnp.float32)
    d_params = disc.init(kd, img, txt)["params"]

    steps = cfg.steps_per_epoch or 1000
    g_tx, d_tx = make_optimizers(cfg, steps)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from moegan_tpu.parallel.sharding import make_param_shardings

        g_shardings = make_param_shardings(
            g_params, mesh, expert_axis=cfg.mesh.expert_axis
        )
        d_shardings = make_param_shardings(
            d_params, mesh, expert_axis=cfg.mesh.expert_axis
        )
        g_params = jax.device_put(g_params, g_shardings)
        d_params = jax.device_put(d_params, d_shardings)

        # Optimizer moments mirror the param pytree inside optax's wrapper
        # states; pin their shardings explicitly (propagation alone leaves
        # them replicated): any leaf whose shape matches an expert-sharded
        # param shape gets the expert spec.
        expert_shapes = {
            tuple(p.shape)
            for p, s in zip(
                jax.tree_util.tree_leaves(g_params),
                jax.tree_util.tree_leaves(g_shardings),
            )
            if s.spec and s.spec[0] == cfg.mesh.expert_axis
        }

        def opt_shardings(tx, params):
            shape_tree = jax.eval_shape(tx.init, params)
            def rule(leaf):
                if tuple(leaf.shape) in expert_shapes:
                    return NamedSharding(
                        mesh, P(cfg.mesh.expert_axis, *([None] * (leaf.ndim - 1)))
                    )
                return NamedSharding(mesh, P())
            return jax.tree_util.tree_map(rule, shape_tree)

        g_opt_state = jax.jit(g_tx.init, out_shardings=opt_shardings(g_tx, g_params))(g_params)
        d_opt_state = jax.jit(d_tx.init, out_shardings=opt_shardings(d_tx, d_params))(d_params)
    else:
        g_opt_state = g_tx.init(g_params)
        d_opt_state = d_tx.init(d_params)

    return TrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_params,
        d_params=d_params,
        g_opt_state=g_opt_state,
        d_opt_state=d_opt_state,
    )


def count_params(tree) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(tree))
