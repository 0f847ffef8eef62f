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

import os

import flax.linen as nn
import jax
import jax.numpy as jnp

from moegan_tpu.core import inits


# ---------------------------------------------------------------------------
# Space-to-depth packed 3x3 conv (the narrow-channel MXU fix)
# ---------------------------------------------------------------------------
#
# At the 32/64-res rungs the channel plan narrows to C=64/32; a direct
# NHWC conv then fills at most a quarter of the MXU's 128-lane I/O tiling
# in BOTH contraction and output dims (~6% of peak). Re-expressing the
# 3x3 stride-1 conv on [B,H,W,C] as a 3x3 conv on the space-to-depth
# packed [B,H/2,W/2,4C] layout with a phase-scattered [3,3,4C,4C] kernel
# is numerically identical (each (out-phase, tap) pair lands in exactly
# one packed-kernel block), costs 4x the nominal FLOPs (the packed kernel
# is 25% dense and the MXU doesn't skip zeros), but runs at ~16x better
# MXU utilization at C=32 — a ~4x net win on the conv. Verified exact in
# tests/test_modconv.py::test_s2d_packed_conv*.
#
# Measured end-to-end on the real v5e chip (round 3, b64 flagship bench):
# s2d ON = 1041 imgs/s vs OFF = 1157 imgs/s. The per-conv MXU win does
# not survive the surrounding modulate/demodulate elementwise chain (the
# pack/unpack transposes break XLA's fusion and the conv was not the
# bottleneck once the v2 MoE kernel landed), so "auto" resolves to OFF.
# The trick is kept behind MOEGAN_S2D_CONV=1 for wider-channel plans
# where the conv dominates.
#
# MOEGAN_S2D_CONV: "auto" (= off), "1" force on, "0" off.


def _space_to_depth(x: jax.Array) -> jax.Array:
    """[B,H,W,C] -> [B,H/2,W/2,4C]; packed channel order (dy, dx, c)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)


def _depth_to_space(x: jax.Array) -> jax.Array:
    """Inverse of _space_to_depth."""
    B, h, w, C4 = x.shape
    C = C4 // 4
    x = x.reshape(B, h, w, 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, 2 * h, 2 * w, C)


def _pack_conv3_kernel(w: jax.Array) -> jax.Array:
    """[3,3,Ci,Co] HWIO -> [3,3,4Ci,4Co] packed-space kernel.

    Original output pixel (2i+dy, 2j+dx) reads original input row
    2i+dy+kh-1 = 2(i + (dy+kh-1)//2) + (dy+kh-1)%2, i.e. packed row
    offset a-1 = (dy+kh-1)//2 and input phase py = (dy+kh-1)%2 (same for
    columns), so each tap scatters into exactly one (a, b, in-phase,
    out-phase) block — no collisions."""
    Ci, Co = w.shape[2], w.shape[3]
    Wp = jnp.zeros((3, 3, 4 * Ci, 4 * Co), w.dtype)
    for dy in range(2):
        for dx in range(2):
            for kh in range(3):
                for kw in range(3):
                    qy, qx = dy + kh - 1, dx + kw - 1
                    a, py = qy // 2 + 1, qy % 2
                    b, px = qx // 2 + 1, qx % 2
                    ci0 = (py * 2 + px) * Ci
                    co0 = (dy * 2 + dx) * Co
                    Wp = Wp.at[a, b, ci0 : ci0 + Ci, co0 : co0 + Co].set(w[kh, kw])
    return Wp


def _s2d_wanted(H: int, W: int, Cin: int, k: int) -> bool:
    mode = os.environ.get("MOEGAN_S2D_CONV", "auto")
    if mode == "0" or k != 3 or H % 2 or W % 2 or H < 4:
        return False
    if mode == "1":
        return True
    return False  # auto: measured slower end-to-end on TPU (see above)


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
            from moegan_tpu.core.upsample import upsample2x_bilinear

            x = upsample2x_bilinear(x)

        pad = k // 2
        if k == 1 and os.environ.get("MOEGAN_1X1_MATMUL", "0") == "1":
            # 1x1 conv as a plain channel matmul — tried to avoid the
            # 33 MB layout-transpose copies the HLO ranking showed around
            # the attention proj convs, but measured a consistent ~4% LOSS
            # at the b64 flagship (909 vs 946 imgs/s, chain7/8 bisection
            # runs/r3_tpu_log7.txt,log8.txt): XLA's TPU conv emitter beats
            # the dot + the copies it saves. Kept opt-in for re-testing on
            # future toolchains.
            out = x @ weight[0, 0].astype(cd)
        elif _s2d_wanted(x.shape[1], x.shape[2], in_channels, k):
            # Narrow-channel path: identical math at 4x channel width so
            # the MXU tiles fill (see module docstring).
            out = _depth_to_space(
                jax.lax.conv_general_dilated(
                    _space_to_depth(x),
                    _pack_conv3_kernel(weight).astype(cd),
                    window_strides=(1, 1),
                    padding=((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
            )
        else:
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
