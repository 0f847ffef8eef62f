"""x2 bilinear upsample as a two-tap separable filter (VPU-only).

`jax.image.resize(..., method="bilinear")` lowers to dot_generals with
spatial interpolation matrices; in the compiled 64x64 train step those
dots produced the largest layout-fighting fusions in the whole program
(~270 MB of tuple outputs with mismatched layouts at blocks.py:63,
round-3 HLO traffic ranking). For the exact x2 / half-pixel-centers case
(the reference's F.interpolate(scale_factor=2, mode="bilinear"),
t2i_moe_gan.py:176-178,634-640) the kernel is a fixed two-tap filter:

    out[2i]   = 0.25*a[i-1] + 0.75*a[i]     (edge-clamped)
    out[2i+1] = 0.75*a[i]   + 0.25*a[i+1]

applied separably over H then W — pure elementwise adds + an interleave
reshape, no MXU, channels stay on the minor axis. Matches
jax.image.resize bit-exactly in bf16 (tests/test_upsample.py).

On-hardware verdict (chain8 bisection): the two-tap path LOST ~4% at
the b64 flagship, so jax.image.resize stays the default and
MOEGAN_FAST_UPSAMPLE=1 opts in. Kept because the measurement, the
bit-exact test, and the trick itself are useful on other shapes and
future toolchains.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def _up2_axis(x: jax.Array, axis: int) -> jax.Array:
    """Double size along `axis` with the two-tap half-pixel filter."""
    n = x.shape[axis]
    first = jax.lax.slice_in_dim(x, 0, 1, axis=axis)
    last = jax.lax.slice_in_dim(x, n - 1, n, axis=axis)
    prev = jnp.concatenate(
        [first, jax.lax.slice_in_dim(x, 0, n - 1, axis=axis)], axis=axis
    )
    nxt = jnp.concatenate(
        [jax.lax.slice_in_dim(x, 1, n, axis=axis), last], axis=axis
    )
    # f32 filter arithmetic (jax.image.resize computes in f32 internally;
    # bf16 two-tap math would differ by one ulp). The converts fuse.
    xf = x.astype(jnp.float32)
    even = (0.25 * prev.astype(jnp.float32) + 0.75 * xf).astype(x.dtype)
    odd = (0.75 * xf + 0.25 * nxt.astype(jnp.float32)).astype(x.dtype)
    # Interleave even/odd along `axis`: stack on a new trailing-neighbor
    # axis then merge. Channels (minor axis) are untouched, so no lane
    # relayout is required.
    stacked = jnp.stack([even, odd], axis=axis + 1)
    new_shape = list(x.shape)
    new_shape[axis] = 2 * n
    return stacked.reshape(new_shape)


def upsample2x_bilinear(x: jax.Array) -> jax.Array:
    """[B, H, W, C] -> [B, 2H, 2W, C], bilinear, half-pixel centers.

    Default = jax.image.resize: the two-tap rewrite measured a ~4% LOSS
    at the b64 flagship (909 vs 935-947 imgs/s, chain8 bisection,
    runs/r3_tpu_log8.txt) — the interleave reshape costs more than the
    resize dots it replaced. MOEGAN_FAST_UPSAMPLE=1 re-enables the
    two-tap path (bit-exact, tests/test_upsample.py) for future
    toolchains."""
    if os.environ.get("MOEGAN_FAST_UPSAMPLE", "0") != "1":
        b, h, w, c = x.shape
        return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="bilinear")
    dt = x.dtype
    x = _up2_axis(x, 1)
    x = _up2_axis(x, 2)
    return x.astype(dt)
