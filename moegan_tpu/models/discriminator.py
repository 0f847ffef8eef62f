"""Text-conditional discriminator with weight-normalized convolutions.

Reference: t2i_moe_gan.py:858-907. Text projection Linear(512->128) under
weight_norm + LeakyReLU (:868-871); stride-2 4x4 convs down to 4x4 spatial
(:874-882, 3->128->256 at max_resolution=16); text features tiled over the
4x4 grid and concatenated (:898-902); final 4x4 conv -> one logit per
sample (:885-887, :905-907). Higher input resolutions extend the conv
ladder per DiscriminatorConfig.channel_plan().
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from moegan_tpu.config import DiscriminatorConfig
from moegan_tpu.core import inits


class WNConv(nn.Module):
    """Conv2d under weight normalization: w = g * v / ||v||_dim0.

    Matches torch.nn.utils.weight_norm (per-output-channel magnitude g,
    initialized to ||v|| so the initial function equals the plain conv).
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.kernel_size
        in_ch = x.shape[-1]
        v = self.param("v", inits.torch_conv_kernel(), (k, k, in_ch, self.features))
        # g initializes to ||v_init|| (closure over the freshly initialized
        # v), reproducing torch weight_norm's w == v at step 0 exactly.
        g = self.param(
            "g",
            lambda key, shape: jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1, 2))),
            (self.features,),
        )
        b = self.param("b", inits.torch_linear_bias(k * k * in_ch), (self.features,))

        norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1, 2), keepdims=True) + 1e-12)
        w = (g[None, None, None, :] / norm) * v

        out = jax.lax.conv_general_dilated(
            x.astype(self.compute_dtype),
            w.astype(self.compute_dtype),
            window_strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + b[None, None, None, :].astype(out.dtype)


class WNDense(nn.Module):
    """Linear under weight normalization (torch weight_norm parity)."""

    features: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_dim = x.shape[-1]
        v = self.param("v", inits.torch_linear_kernel(), (in_dim, self.features))
        g = self.param(
            "g",
            lambda key, shape: jnp.sqrt(jnp.sum(jnp.square(v), axis=0)),
            (self.features,),
        )
        b = self.param("b", inits.torch_linear_bias(in_dim), (self.features,))
        norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=0, keepdims=True) + 1e-12)
        w = (g[None, :] / norm) * v
        return x @ w + b


class AuroraDiscriminator(nn.Module):
    config: DiscriminatorConfig = DiscriminatorConfig()

    @nn.compact
    def __call__(self, img: jax.Array, text_embedding: jax.Array) -> jax.Array:
        """img: [B, R, R, 3] in [-1, 1]; text: [B, 512]. Returns logits [B]."""
        cfg = self.config
        cd = jnp.dtype(cfg.compute_dtype)

        x = img.astype(cd)
        for i, ch in enumerate(cfg.channel_plan()):
            x = WNConv(ch, 4, stride=2, padding=1, compute_dtype=cd, name=f"conv_{i}")(x)
            x = nn.leaky_relu(x, 0.2)

        tfeat = WNDense(cfg.text_features, name="text_projection")(
            text_embedding.astype(jnp.float32)
        )
        tfeat = nn.leaky_relu(tfeat, 0.2).astype(cd)

        h = x.shape[1]
        tmap = jnp.broadcast_to(
            tfeat[:, None, None, :], (x.shape[0], h, h, cfg.text_features)
        )
        combined = jnp.concatenate([x, tmap], axis=-1)

        out = WNConv(1, h, stride=1, padding=0, compute_dtype=cd, name="output_conv")(
            combined
        )
        return out.reshape(img.shape[0]).astype(jnp.float32)
