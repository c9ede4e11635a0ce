"""Multi-chip parallelism: device meshes and sharded direct summation."""
from .sharded import ShardedDirect, make_particle_mesh

__all__ = ["ShardedDirect", "make_particle_mesh"]
