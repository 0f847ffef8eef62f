"""Parameter initializers matching the reference's training dynamics.

The reference uses torch defaults plus a few explicit inits
(kaiming-normal conv weights at t2i_moe_gan.py:150, N(0, 0.02) modulation
at :151, N(0, 0.01) router means at :281-292). Matching init statistics
keeps the loss trajectories comparable even though the frameworks differ.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def kaiming_normal_leaky(negative_slope: float = 0.2, mode_axis: str = "conv_hwio"):
    """He-normal with leaky-relu gain over fan_in.

    For conv kernels in HWIO layout fan_in = H*W*I; for linear kernels in
    (in, out) layout fan_in = in.
    """

    gain = math.sqrt(2.0 / (1.0 + negative_slope**2))

    def init(key, shape, dtype=jnp.float32):
        if mode_axis == "conv_hwio":
            fan_in = shape[0] * shape[1] * shape[2]
        else:
            fan_in = shape[0]
        std = gain / math.sqrt(fan_in)
        return std * jax.random.normal(key, shape, dtype)

    return init


def torch_linear_kernel():
    """torch.nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in)); kernel (in, out)."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(shape[0])
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_linear_bias(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_conv_kernel():
    """torch.nn.Conv2d default (kaiming uniform a=sqrt(5)); kernel HWIO."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0] * shape[1] * shape[2]
        gain = math.sqrt(2.0 / (1.0 + 5.0))
        bound = math.sqrt(3.0) * gain / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def normal(std: float = 0.02):
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)

    return init


def constant(value: float):
    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, value, dtype)

    return init
