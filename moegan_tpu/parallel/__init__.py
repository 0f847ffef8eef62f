from moegan_tpu.parallel.mesh import create_mesh, maybe_mesh_context
from moegan_tpu.parallel.sharding import constrain, param_sharding_rules

__all__ = ["create_mesh", "maybe_mesh_context", "constrain", "param_sharding_rules"]
