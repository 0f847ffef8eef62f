"""bilinear_grid_sample parity vs torch.nn.functional.grid_sample
(mode='bilinear', align_corners=False, padding_mode='zeros') — the exact
op the reference MTM uses (t2i_moe_gan.py:239)."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from moegan_tpu.ops.grid_sample import bilinear_grid_sample


def test_parity_with_torch_grid_sample():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 8, 8, 5)).astype(np.float32)
    # in-range and out-of-range coords to exercise zero padding
    grid = rng.uniform(-1.3, 1.3, size=(3, 8, 8, 2)).astype(np.float32)

    got = np.asarray(bilinear_grid_sample(jnp.asarray(x), jnp.asarray(grid)))

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)  # NCHW
    want = (
        F.grid_sample(
            xt, torch.from_numpy(grid), mode="bilinear",
            align_corners=False, padding_mode="zeros",
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_identity_grid_is_identity():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 6, 6, 2)).astype(np.float32)
    ys = np.linspace(-1, 1, 6, dtype=np.float32)
    gx, gy = np.meshgrid(ys, ys)
    grid = np.stack([gx, gy], -1)[None]
    # At exactly +/-1 the half-pixel convention samples slightly inside
    # with zero-padding taps; compare against torch for the same grid.
    got = np.asarray(bilinear_grid_sample(jnp.asarray(x), jnp.asarray(grid)))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = (
        F.grid_sample(xt, torch.from_numpy(grid), mode="bilinear",
                      align_corners=False, padding_mode="zeros")
        .permute(0, 2, 3, 1).numpy()
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
