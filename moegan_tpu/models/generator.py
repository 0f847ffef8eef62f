"""Aurora generator: progressive modulated-conv/attention/MoE stack.

Reference: t2i_moe_gan.py:668-855. text_projection MLP (Linear-LayerNorm-
LeakyReLU-Linear, :682-687), mapping network [z||text] -> w (4 Linears with
LeakyReLU between, :690-698), learned 4x4x512 constant (:701), generative
blocks 4 -> 8 -> 16 (:704-706) with RGB taps at 8/16 (:709-710), truncation
trick toward the zero-input mean latent (:799-808).

This rebuild extends the ladder to the 32/64 blocks the reference stubs
but never built (:1019-1024): `GeneratorConfig.max_resolution` = 16
reproduces the reference topology exactly; 64 is the flagship.

TPU-native: NHWC layout, bf16 activations / fp32 params, nn.remat on each
generative block (the jax.checkpoint analog of the reference's
torch.utils.checkpoint usage :734-760), explicit PRNG threading for latent
noise and router weight sampling (rngs={'router': key}).
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from moegan_tpu.config import GeneratorConfig
from moegan_tpu.core import inits
from moegan_tpu.core.blocks import GenerativeBlock
from moegan_tpu.core.modconv import ModulatedConv


class GeneratorOutput(NamedTuple):
    image: jax.Array  # [B, R, R, 3] at max_resolution
    intermediates: dict  # {resolution: [B, r, r, 3]} RGB taps (incl. final)
    kl: jax.Array  # scalar sum of router KLs (0 when not training)
    routing: tuple  # per-block routing probs [B, T_r, E]


class AuroraGenerator(nn.Module):
    config: GeneratorConfig = GeneratorConfig()

    @nn.compact
    def __call__(
        self,
        z: jax.Array,  # [B, latent_dim]
        text_embeddings: jax.Array,  # [B, text_embedding_dim]
        truncation_psi: float = 1.0,
        training: bool = True,
        annealing_factor: jax.Array | float = 1.0,
    ) -> GeneratorOutput:
        cfg = self.config
        cd = jnp.dtype(cfg.compute_dtype)
        B = z.shape[0]

        if text_embeddings.shape[0] != B and text_embeddings.shape[0] == 1:
            text_embeddings = jnp.broadcast_to(
                text_embeddings, (B, text_embeddings.shape[-1])
            )
        text_embeddings = text_embeddings.astype(jnp.float32)

        # Text sequence for the cross-attention layers (ref :682-687, :790).
        tp1 = nn.Dense(
            cfg.text_embedding_dim,
            kernel_init=inits.torch_linear_kernel(),
            bias_init=inits.torch_linear_bias(cfg.text_embedding_dim),
            name="text_proj_1",
        )
        # torch nn.LayerNorm eps parity (1e-5; flax defaults to 1e-6).
        # Tiny [B, 512] input — the XLA path is fine, no fused kernel.
        tp_ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="text_proj_ln")
        tp2 = nn.Dense(
            cfg.text_embedding_dim,
            kernel_init=inits.torch_linear_kernel(),
            bias_init=inits.torch_linear_bias(cfg.text_embedding_dim),
            name="text_proj_2",
        )
        text_seq = tp2(nn.leaky_relu(tp_ln(tp1(text_embeddings)), 0.2))[:, None, :]

        # Mapping network [z || text] -> w (ref :690-698).
        widths = [cfg.mapping_width] * cfg.mapping_layers
        mapping_layers = []
        in_dim = cfg.latent_dim + cfg.text_embedding_dim
        for i, width in enumerate(widths):
            mapping_layers.append(
                nn.Dense(
                    width,
                    kernel_init=inits.torch_linear_kernel(),
                    bias_init=inits.torch_linear_bias(in_dim),
                    name=f"mapping_{i}",
                )
            )
            in_dim = width

        def run_mapping(v):
            for i, layer in enumerate(mapping_layers):
                v = layer(v)
                if i < len(mapping_layers) - 1:
                    v = nn.leaky_relu(v, 0.2)
            return v

        w = run_mapping(jnp.concatenate([z.astype(jnp.float32), text_embeddings], axis=-1))

        # Truncation trick toward the zero-input mean latent (ref :799-808).
        # truncation_psi may be a traced array (scalar or per-sample [B] —
        # the serving micro-batcher mixes requests with different psi in
        # one dispatch); a static float >= 1.0 keeps the no-op fast path.
        if isinstance(truncation_psi, jax.Array) or truncation_psi < 1.0:
            zeros = jnp.zeros((1, cfg.latent_dim + cfg.text_embedding_dim), jnp.float32)
            mean_latent = jax.lax.stop_gradient(run_mapping(zeros))
            psi = jnp.asarray(truncation_psi, jnp.float32)
            if psi.ndim == 1:
                psi = psi[:, None]
            w = mean_latent + psi * (w - mean_latent)

        constant = self.param(
            "constant", nn.initializers.normal(1.0), (1, 4, 4, cfg.channels[4])
        )
        x = jnp.broadcast_to(constant, (B, 4, 4, cfg.channels[4])).astype(cd)

        block_cls = GenerativeBlock
        if cfg.remat_blocks and training:
            # argnums count from self; `training` is the 4th call argument.
            block_cls = nn.remat(GenerativeBlock, static_argnums=(4,))

        kls, routings, rgbs = [], [], {}
        for r in cfg.resolutions():
            block = block_cls(
                out_channels=cfg.channels[r],
                text_dim=cfg.text_embedding_dim,
                upsample=(r > 4),
                use_offset=(r <= cfg.offset_max_resolution),
                heads=cfg.heads_for(cfg.channels[r]),
                num_experts=cfg.num_experts,
                router_hidden=cfg.router_hidden,
                compute_dtype=cd,
                use_pallas=cfg.use_pallas,
                name=f"gen_block_{r}",
            )
            x, kl, probs = block(x, w, text_seq, training, annealing_factor)
            kls.append(kl)
            routings.append(probs)
            if r >= cfg.rgb_min_resolution:
                rgbs[r] = ModulatedConv(
                    3, 1, compute_dtype=cd, name=f"to_rgb_{r}"
                )(x, w).astype(jnp.float32)

        final = rgbs[cfg.max_resolution]
        kl = jnp.sum(jnp.stack(kls)) if kls else jnp.zeros((), jnp.float32)
        return GeneratorOutput(
            image=final, intermediates=rgbs, kl=kl, routing=tuple(routings)
        )
