"""nbody_streams_tpu — TPU-native direct N-body framework.

A from-scratch JAX / XLA / Pallas re-design of the capabilities of the
reference CUDA framework (appy2806/Nbody_streams): multi-species
collisionless N-body simulation, stellar-stream generation, external BFE
potentials, dynamical friction, analysis utilities and SPH visualization —
built TPU-first (Pallas tiled kernels, jitted lax.scan integration,
mesh-sharded direct summation over ICI).
"""
from .__version__ import __version__
from .constants import G_DEFAULT, NBODY_UNITS, KERNEL_IDS
from .species import Species, PerformanceWarning
from .ops import (
    compute_forces_direct,
    compute_potential_direct,
)

__all__ = [
    "__version__",
    "G_DEFAULT",
    "NBODY_UNITS",
    "KERNEL_IDS",
    "Species",
    "PerformanceWarning",
    "compute_forces_direct",
    "compute_potential_direct",
]
