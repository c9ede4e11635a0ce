"""Force/potential evaluation kernels (pure-jnp oracle + Pallas fast path)."""
from .kernels import force_factor, potential_factor
from .pairwise import (
    compute_forces_direct,
    compute_potential_direct,
    accel_tile,
    potential_tile,
)

__all__ = [
    "force_factor",
    "potential_factor",
    "compute_forces_direct",
    "compute_potential_direct",
    "accel_tile",
    "potential_tile",
]
