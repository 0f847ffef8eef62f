"""Device mesh construction for data x expert parallelism over ICI.

The reference has no distributed path at all (SURVEY.md §2.8 — single
device, InstanceCount 1 everywhere). This module is the new TPU-native
capability: a 2-D mesh whose 'data' axis shards the batch (grads psum'd by
XLA) and whose 'expert' axis shards the stacked expert weights of every
SparseMoE layer.
"""

from __future__ import annotations

import contextlib
import math

import jax
import numpy as np
from jax.sharding import Mesh


def create_mesh(
    devices=None,
    *,
    expert_parallelism: int = 1,
    data_axis: str = "data",
    expert_axis: str = "expert",
) -> Mesh:
    """Build a (data, expert) mesh over the given devices.

    expert_parallelism must divide both the device count and the model's
    num_experts. With expert_parallelism=1 this degenerates to pure DP.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    ep = expert_parallelism
    if n % ep != 0:
        raise ValueError(f"expert_parallelism {ep} does not divide device count {n}")
    arr = np.asarray(devices).reshape(n // ep, ep)
    return Mesh(arr, (data_axis, expert_axis))


def auto_expert_parallelism(n_devices: int, num_experts: int) -> int:
    """Largest expert-axis size that divides both device and expert counts."""
    return math.gcd(n_devices, num_experts)


@contextlib.contextmanager
def maybe_mesh_context(mesh: Mesh | None):
    """`jax.sharding.set_mesh` when a mesh is given; no-op otherwise."""
    if mesh is None:
        yield
    else:
        with jax.sharding.set_mesh(mesh):
            yield
