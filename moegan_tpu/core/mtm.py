"""Modulated Transformation Module (Aurora MTM).

Reference: t2i_moe_gan.py:188-247. An optional 2-channel offset field
(3x3 conv -> LeakyReLU -> 3x3 conv, :209-213) deforms the feature map via
bilinear grid sampling (offsets x0.05, grid clamped to [-1,1], :222-239),
then a modulated conv + LeakyReLU(0.2). Deformation is only enabled for
resolutions <= 16 (:199).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from moegan_tpu.core import inits
from moegan_tpu.core.modconv import ModulatedConv
from moegan_tpu.ops.grid_sample import bilinear_grid_sample


class ModulatedTransformationModule(nn.Module):
    out_channels: int
    kernel_size: int = 3
    use_offset: bool = False
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, w: jax.Array) -> jax.Array:
        B, H, W, C = x.shape

        if self.use_offset:
            h = nn.Conv(
                32,
                (3, 3),
                padding="SAME",
                kernel_init=inits.torch_conv_kernel(),
                bias_init=inits.torch_linear_bias(C * 9),
                dtype=self.compute_dtype,
                name="offset_conv1",
            )(x)
            h = nn.leaky_relu(h, 0.2)
            offsets = nn.Conv(
                2,
                (3, 3),
                padding="SAME",
                kernel_init=inits.torch_conv_kernel(),
                bias_init=inits.torch_linear_bias(32 * 9),
                dtype=jnp.float32,
                name="offset_conv2",
            )(h)

            # Base identity grid: linspace(-1, 1) over each axis, (x, y)
            # channel order to match torch grid_sample (ref :226-231).
            ys = jnp.linspace(-1.0, 1.0, H)
            xs = jnp.linspace(-1.0, 1.0, W)
            grid_x, grid_y = jnp.meshgrid(xs, ys)  # each [H, W]
            grid = jnp.stack([grid_x, grid_y], axis=-1)[None]  # [1,H,W,2]
            grid = grid + offsets.astype(jnp.float32) * 0.05  # ref :234
            grid = jnp.clip(grid, -1.0, 1.0)
            x = bilinear_grid_sample(x, jnp.broadcast_to(grid, (B, H, W, 2)))

        x = ModulatedConv(
            self.out_channels,
            self.kernel_size,
            compute_dtype=self.compute_dtype,
            name="modulated_conv",
        )(x, w)
        return nn.leaky_relu(x, 0.2)
