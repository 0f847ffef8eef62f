"""Sharding annotations and parameter partition rules.

Everything here degrades to a no-op on a single device / outside a mesh
context, so the same model code runs unmodified on one chip, on a CPU
test mesh (xla_force_host_platform_device_count) and on a v5e-8 pod slice.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P


def _abstract_mesh():
    m = jax.sharding.get_abstract_mesh()
    if m is None or not m.axis_names:
        return None
    return m


def constrain(x: jax.Array, spec: tuple) -> jax.Array:
    """with_sharding_constraint(x, P(*spec)) if inside a mesh, else identity.

    Axis names absent from the ambient mesh are replaced by None so the
    same model code works on a pure-DP mesh without an 'expert' axis.
    """
    m = _abstract_mesh()
    if m is None:
        return x
    names = set(m.axis_names)
    cleaned = tuple(s if (s in names) else None for s in spec)
    if all(s is None for s in cleaned):
        return x
    return jax.lax.with_sharding_constraint(x, P(*cleaned))


def param_sharding_rules(path_leaf: tuple, leaf, *, expert_axis: str = "expert") -> P:
    """PartitionSpec for one parameter leaf.

    Expert-stacked MoE weights (names w1/b1/w2/b2 under a SparseMoE scope,
    leading axis = num_experts) shard over the expert axis; everything else
    (a few tens of MB) is replicated — the right call at this model scale,
    where ICI all-gathers of small params would dominate.
    """
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path_leaf]
    if names and names[-1] in ("w1", "b1", "w2", "b2") and any("moe" in str(n).lower() for n in names):
        return P(expert_axis, *([None] * (leaf.ndim - 1)))
    return P()


def make_param_shardings(params, mesh, *, expert_axis: str = "expert"):
    """Map a param pytree to NamedShardings under ``mesh``."""
    def rule(path, leaf):
        if expert_axis not in mesh.axis_names:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, param_sharding_rules(path, leaf, expert_axis=expert_axis))

    return jax.tree_util.tree_map_with_path(rule, params)


def batch_sharding(mesh, *, data_axis: str = "data"):
    """Shard the leading (batch) axis of every leaf over the data axis."""
    def spec(leaf):
        return NamedSharding(mesh, P(data_axis, *([None] * (leaf.ndim - 1))))

    return spec
