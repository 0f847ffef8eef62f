"""StyleGAN2/Aurora modulated convolution, TPU-native formulation.

The reference (t2i_moe_gan.py:122-186) materializes a per-sample weight
tensor and runs a grouped conv2d with groups=batch — the standard CUDA
trick. On TPU that shape-shifting defeats XLA's conv tiling, so we use the
mathematically identical *input/output scaling* form:

    conv(x, W * s_b)            == conv(x * s_b, W)          (linearity)
    demod d_{b,o} = rsqrt(sum_{i,k} (W_{o,i,k} s_{b,i})^2 + 1e-8)
    out = conv(x * s_b, W) * d_{b,o}

One shared-weight convolution (perfect MXU tiling, batched), two cheap
elementwise scalings, and the demod factor computed with a single [O,I]x
[I,B] matmul of squared terms. NHWC layout throughout (channels on the
128-lane axis).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from moegan_tpu.core import inits


class ModulatedConv(nn.Module):
    """Modulated conv with optional demodulation and x2 bilinear pre-upsample.

    Equivalent to reference ModulatedConv (t2i_moe_gan.py:122-186):
    style = Linear(w) scales input channels (:158-161), demodulation
    rsqrt-normalizes per (batch, out-channel) (:164-166), optional bilinear
    x2 upsample before the conv (:176-178). No bias (reference has none).
    """

    out_channels: int
    kernel_size: int = 3
    demodulate: bool = True
    upsample: bool = False
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, w: jax.Array) -> jax.Array:
        """x: [B, H, W, C] features; w: [B, latent] style vector."""
        in_channels = x.shape[-1]
        k = self.kernel_size

        weight = self.param(
            "weight",
            inits.kaiming_normal_leaky(0.2, "conv_hwio"),
            (k, k, in_channels, self.out_channels),
        )
        mod_kernel = self.param(
            "mod_kernel", inits.normal(0.02), (w.shape[-1], in_channels)
        )
        mod_bias = self.param("mod_bias", inits.constant(0.0), (in_channels,))

        # Style scale per (batch, in-channel). Reference modulation Linear
        # init: N(0, 0.02) weight, zero bias (:151-152). NOTE: unlike
        # StyleGAN2 there is no +1 — parity with the reference.
        style = w.astype(jnp.float32) @ mod_kernel + mod_bias  # [B, Cin]

        if self.demodulate:
            # d_{b,o} = rsqrt(sum_{hw,i} (W_{hw,i,o} * s_{b,i})^2 + 1e-8)
            w2 = jnp.sum(jnp.square(weight), axis=(0, 1))  # [Cin, Cout]
            denom = jnp.square(style) @ w2  # [B, Cout]
            demod = jax.lax.rsqrt(denom + 1e-8)
        else:
            demod = None

        cd = self.compute_dtype
        x = x.astype(cd) * style[:, None, None, :].astype(cd)

        if self.upsample:
            b, h, ww_, c = x.shape
            x = jax.image.resize(x, (b, 2 * h, 2 * ww_, c), method="bilinear")

        pad = k // 2
        out = jax.lax.conv_general_dilated(
            x,
            weight.astype(cd),
            window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if demod is not None:
            out = out * demod[:, None, None, :].astype(out.dtype)
        return out.astype(cd)
