"""Bilinear grid sampling (feature deformation) in pure XLA.

TPU-native replacement for torch.nn.functional.grid_sample(mode='bilinear',
align_corners=False, padding_mode='zeros') as used by the reference MTM
(t2i_moe_gan.py:222-239). The maps it warps are tiny (<=16x16), so a fully
vectorized one-hot-free gather formulation is bandwidth-trivial; what
matters is staying inside jit with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_grid_sample(x: jax.Array, grid: jax.Array) -> jax.Array:
    """Sample ``x`` at normalized coordinates ``grid``.

    Args:
      x: [B, H, W, C] input features (NHWC).
      grid: [B, Hg, Wg, 2] normalized coords in [-1, 1], last axis = (x, y)
        matching torch grid_sample convention (x indexes width).

    Returns:
      [B, Hg, Wg, C] sampled features, zeros outside the input extent
      (padding_mode='zeros', align_corners=False semantics).
    """
    B, H, W, C = x.shape
    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)

    # align_corners=False: -1 maps to -0.5 px, +1 maps to (size-0.5) px.
    fx = ((gx + 1.0) * W - 1.0) * 0.5
    fy = ((gy + 1.0) * H - 1.0) * 0.5

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = fx - x0
    ty = fy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xc = jnp.clip(xi, 0, W - 1)
        yc = jnp.clip(yi, 0, H - 1)
        # Gather per-batch pixels: flatten spatial, one gather per tap.
        flat = x.reshape(B, H * W, C)
        idx = yc * W + xc  # [B, Hg, Wg]
        vals = jnp.take_along_axis(
            flat[:, :, :], idx.reshape(B, -1)[..., None], axis=1
        ).reshape(*idx.shape, C)
        return jnp.where(valid[..., None], vals, 0.0)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)

    wx = tx[..., None]
    wy = ty[..., None]
    out = (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )
    return out.astype(x.dtype)
