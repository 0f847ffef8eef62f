"""Convolution and generative blocks of the Aurora generator.

Reference: t2i_moe_gan.py:579-666. ConvolutionBlock = two MTMs plus a skip
(1x1 modulated-conv projection when channel counts differ). GenerativeBlock
= optional x2 bilinear upsample -> ConvolutionBlock -> AttentionBlock.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from moegan_tpu.core.attention import AttentionBlock
from moegan_tpu.core.modconv import ModulatedConv
from moegan_tpu.core.mtm import ModulatedTransformationModule
from moegan_tpu.core.upsample import upsample2x_bilinear


class ConvolutionBlock(nn.Module):
    out_channels: int
    use_offset: bool = False
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, w: jax.Array) -> jax.Array:
        identity = x
        out = ModulatedTransformationModule(
            self.out_channels, 3, self.use_offset, self.compute_dtype, name="mtm1"
        )(x, w)
        out = ModulatedTransformationModule(
            self.out_channels, 3, self.use_offset, self.compute_dtype, name="mtm2"
        )(out, w)
        if x.shape[-1] != self.out_channels:
            identity = ModulatedConv(
                self.out_channels, 1, compute_dtype=self.compute_dtype, name="skip_proj"
            )(identity, w)
        return out + identity


class GenerativeBlock(nn.Module):
    out_channels: int
    text_dim: int = 512
    upsample: bool = False
    use_offset: bool = False
    heads: int = 8
    num_experts: int = 4
    router_hidden: int = 128
    compute_dtype: jnp.dtype = jnp.bfloat16
    use_pallas: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        w: jax.Array,
        text_seq: jax.Array,
        training: bool = True,
        annealing_factor: jax.Array | float = 1.0,
    ):
        # NOTE: `training` stays positional so nn.remat can mark it static.
        if self.upsample:
            x = upsample2x_bilinear(x)
        x = ConvolutionBlock(
            self.out_channels, self.use_offset, self.compute_dtype, name="conv_block"
        )(x, w)
        x, kl, probs = AttentionBlock(
            dim=self.out_channels,
            text_dim=self.text_dim,
            heads=self.heads,
            num_experts=self.num_experts,
            router_hidden=self.router_hidden,
            compute_dtype=self.compute_dtype,
            use_pallas=self.use_pallas,
            name="attn_block",
        )(x, w, text_seq, training=training, annealing_factor=annealing_factor)
        return x, kl, probs
