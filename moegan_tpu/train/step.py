"""The jitted adversarial train step (the hot path).

Functional rebuild of the reference hot loop (t2i_moe_gan.py:1214-1495,
call stack in SURVEY.md §3.1): D phase (real / R1 double-backward / fake
with a no-grad generator forward / shuffled-text matching-aware term),
then G phase (fresh generator forward with router weight sampling,
adversarial + multi-level CLIP + balance + annealed-KL losses). Both
phases, both optimizer updates and all metrics execute inside ONE jit with
donated state — no host round-trips inside the step.

PRNG discipline: the single `rng` argument is folded into independent
streams for z, the two router-sampling forwards, and the mismatch shuffle
(replacing the reference's persistent epsilon buffers and global
torch.randn, :296-298/:1266/:1303).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from moegan_tpu.config import TrainConfig
from moegan_tpu.losses.clip_loss import multi_level_clip_loss
from moegan_tpu.losses.gan import (
    discriminator_loss,
    expert_top1_per_block,
    expert_utilization_per_block,
    generator_loss,
    moe_balance_loss,
)
from moegan_tpu.models.discriminator import AuroraDiscriminator
from moegan_tpu.models.generator import AuroraGenerator
from moegan_tpu.train.state import TrainState, make_optimizers


def make_train_step(
    cfg: TrainConfig,
    steps_per_epoch: int | None = None,
    with_clip: bool = True,
    jit_compile: bool = True,
):
    """Build the jitted train step.

    Returns step_fn(state, batch, rng, schedule, clip_params) -> (state,
    metrics) where batch = {'image': [B,R,R,3] in [-1,1], 'text': [B,512]}
    and schedule = {'effective_kl_weight', 'temperature_factor'} scalars
    (computed per epoch on the host, ref :1168-1178).
    """
    gen = AuroraGenerator(cfg.generator)
    disc = AuroraDiscriminator(cfg.discriminator)
    g_tx, d_tx = make_optimizers(cfg, steps_per_epoch or cfg.steps_per_epoch or 1000)
    lcfg = cfg.loss

    def step_fn(state: TrainState, batch, rng, schedule, clip_params=None):
        real = batch["image"].astype(jnp.float32)
        text = batch["text"].astype(jnp.float32)
        B = real.shape[0]
        temp = schedule["temperature_factor"]
        eff_kl_w = schedule["effective_kl_weight"]

        k_z, k_router_d, k_router_g, k_shuffle = jax.random.split(rng, 4)
        z = jax.random.normal(k_z, (B, cfg.generator.latent_dim), jnp.float32)
        perm = jax.random.permutation(k_shuffle, B)
        mismatched_text = text[perm]

        # One differentiable generator forward per step when shared_fake
        # (the standard GAN pattern — PyTorch DCGAN-tutorial style: D
        # trains on output.detach(), G reuses the same output). The
        # reference regenerates per phase (:1292, :1358) — two full G
        # forwards with independent Bayesian weight samples; shared_fake
        # = False reproduces that. Sharing saves ~a fifth of the step
        # (G forward is 17.8 ms of 92 ms at b64, scripts/phase_bench.py).
        shared = cfg.shared_fake

        def g_forward(g_params):
            return gen.apply(
                {"params": g_params},
                z,
                text,
                training=True,
                annealing_factor=temp,
                rngs={"router": k_router_g},
            )

        if shared:
            shared_out, g_pullback = jax.vjp(g_forward, state.g_params)
            d_fake = jax.lax.stop_gradient(shared_out.image)
        else:
            d_fake = None

        # ------------------ D phase ------------------
        def d_loss_fn(d_params):
            def d_on_images(imgs):
                return disc.apply({"params": d_params}, imgs, text)

            # real_pred and its input-gradient in one vjp (R1, ref :1282-1286).
            real_pred, pullback = jax.vjp(d_on_images, real)
            (grad_real,) = pullback(jnp.ones_like(real_pred))
            pen = jnp.sum(jnp.square(grad_real.astype(jnp.float32)), axis=(1, 2, 3))
            r1 = (lcfg.r1_gamma / 2.0) * jnp.mean(pen)

            if shared:
                fake = d_fake
            else:
                fake_out = gen.apply(
                    {"params": jax.lax.stop_gradient(state.g_params)},
                    z,
                    text,
                    training=True,
                    annealing_factor=temp,
                    rngs={"router": k_router_d},
                )
                fake = jax.lax.stop_gradient(fake_out.image)

            fake_pred = disc.apply({"params": d_params}, fake, text)
            mism_pred = disc.apply({"params": d_params}, real, mismatched_text)

            d_gan = discriminator_loss(real_pred, fake_pred, mism_pred, lcfg.gan_loss)
            return d_gan + r1, (d_gan, r1)

        (d_total, (d_gan, r1)), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.d_params
        )
        d_updates, d_opt_state = d_tx.update(d_grads, state.d_opt_state, state.d_params)
        d_params = jax.tree_util.tree_map(lambda p, u: p + u, state.d_params, d_updates)

        # ------------------ G phase ------------------
        def g_losses_from_out(out):
            kl = jnp.minimum(out.kl, lcfg.kl_clamp)  # ref :1369-1370

            fake_pred_g = disc.apply({"params": d_params}, out.image, text)
            g_gan = generator_loss(fake_pred_g, lcfg.gan_loss)

            clip_metrics = {}
            g_clip = jnp.zeros((), jnp.float32)
            if with_clip and clip_params is not None:
                # All RGB taps in ONE batched ViT pass (vs the reference's
                # per-tap encode, t2i_moe_gan.py:1385-1387).
                taps = {
                    r: out.intermediates[r]
                    for r, weight in lcfg.clip_weights.items()
                    if r in out.intermediates and weight > 0
                }
                for r, cl in multi_level_clip_loss(
                    clip_params, taps, text,
                    stop_gradient=lcfg.clip_stop_gradient,
                ).items():
                    clip_metrics[f"clip_loss_{r}"] = cl
                    g_clip = g_clip + lcfg.clip_weights[r] * cl

            balance = moe_balance_loss(
                out.routing,
                lcfg.balance_weight,
                all_blocks=lcfg.balance_all_blocks,
                kind=lcfg.balance_kind,
            )
            total = g_gan + g_clip + balance + eff_kl_w * kl
            aux = dict(
                g_loss=g_gan,
                kl_loss=kl,
                balance_loss=balance,
                expert_util=expert_utilization_per_block(out.routing),
                expert_top1=expert_top1_per_block(out.routing),
                **clip_metrics,
            )
            return total, aux

        if shared:
            (g_total, g_aux), dout = jax.value_and_grad(
                g_losses_from_out, has_aux=True
            )(shared_out)
            (g_grads,) = g_pullback(dout)
        else:
            def g_loss_fn(g_params):
                return g_losses_from_out(g_forward(g_params))

            (g_total, g_aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
                state.g_params
            )
        g_updates, g_opt_state = g_tx.update(g_grads, state.g_opt_state, state.g_params)
        g_params = jax.tree_util.tree_map(lambda p, u: p + u, state.g_params, g_updates)

        new_state = TrainState(
            step=state.step + 1,
            g_params=g_params,
            d_params=d_params,
            g_opt_state=g_opt_state,
            d_opt_state=d_opt_state,
        )
        metrics = dict(d_loss=d_gan, r1_loss=r1, d_total=d_total, g_total=g_total, **g_aux)
        return new_state, metrics

    if jit_compile:
        return jax.jit(step_fn, donate_argnums=(0,)), (g_tx, d_tx)
    return step_fn, (g_tx, d_tx)


def make_eval_step(cfg: TrainConfig, with_clip: bool = True):
    """Validation step (ref :1518-1629): D/G/CLIP losses, no param updates,
    deterministic router (mean weights, but soft routing as in the
    reference's eval-mode generator-in-val which uses training=False...
    NOTE the reference runs validation with models in eval() mode, i.e.
    hard top-1 routing and mean router weights — reproduced here)."""
    gen = AuroraGenerator(cfg.generator)
    disc = AuroraDiscriminator(cfg.discriminator)
    lcfg = cfg.loss

    def eval_fn(state: TrainState, batch, rng, schedule, clip_params=None):
        real = batch["image"].astype(jnp.float32)
        text = batch["text"].astype(jnp.float32)
        B = real.shape[0]
        temp = schedule["temperature_factor"]
        eff_kl_w = schedule["effective_kl_weight"]

        k_z, k_shuffle = jax.random.split(rng)
        z = jax.random.normal(k_z, (B, cfg.generator.latent_dim), jnp.float32)

        out = gen.apply(
            {"params": state.g_params}, z, text, training=False, annealing_factor=temp
        )
        real_pred = disc.apply({"params": state.d_params}, real, text)
        fake_pred = disc.apply({"params": state.d_params}, out.image, text)
        perm = jax.random.permutation(k_shuffle, B)
        mism_pred = disc.apply({"params": state.d_params}, real, text[perm])

        metrics = {
            "val_d_loss": discriminator_loss(real_pred, fake_pred, mism_pred, lcfg.gan_loss),
            # ref :1577-1579: val G loss includes the annealed KL term.
            "val_g_loss": generator_loss(fake_pred, lcfg.gan_loss)
            + eff_kl_w * jnp.minimum(out.kl, lcfg.kl_clamp),
        }
        if with_clip and clip_params is not None:
            taps = {
                r: out.intermediates[r]
                for r in out.intermediates
                if r in lcfg.clip_weights
            }
            for r, cl in multi_level_clip_loss(
                clip_params, taps, text, stop_gradient=True
            ).items():
                metrics[f"val_clip_loss_{r}"] = cl
            top = max(r for r in out.intermediates)
            if f"val_clip_loss_{top}" in metrics:
                # primary HPO objective (ref :1625)
                metrics["val_clip_loss"] = metrics[f"val_clip_loss_{top}"]
        return metrics

    return jax.jit(eval_fn)
