"""Import-path alias for reference call sites.

The reference keeps its SPH splatting in ``nbody_streams.viz.
sph_kernels`` (reference: viz/sph_kernels.py); here the renderer lives
in :mod:`nbody_streams_tpu.viz.sph` as one jitted splat.  ``render_cpu``
and ``render_gpu`` (reference sph_kernels.py:381,532) are the same
function here — the jitted splat runs wherever JAX runs — exposed with
the reference's positional-``h`` signature.  CUDA tiling knobs
(``chunk_size``/``sort_by_morton``/``verbose``) are accepted and
ignored.
"""
import numpy as np

from .sph import get_smoothing_lengths, render_surface_density
from .sph import _render_native

__all__ = ["get_smoothing_lengths", "render_surface_density",
           "render_cpu", "render_gpu"]


def _render_ref_layout(x, y, mass, h, resolution, gridsize):
    """Reference grid contract: shape (resolution, resolution) indexed
    [ix, iy] over [-gridsize/2, gridsize/2]^2 (reference
    sph_kernels.py:378)."""
    x = np.asarray(x, float)
    y = np.asarray(y, float)
    half = float(gridsize) / 2.0
    img, _ = _render_native(
        np.column_stack([x, y]), np.asarray(mass, float),
        extent=(-half, half, -half, half), npix=int(resolution),
        axes=(0, 1), smoothing=np.asarray(h, float))
    return img.T


def render_cpu(x, y, mass, h, resolution: int = 512,
               gridsize: float = 200.0, sort_by_morton: bool = False,
               verbose: bool = False):
    """Drop-in for the reference ``render_cpu`` (sph_kernels.py:381):
    returns the (resolution, resolution) ``[ix, iy]`` grid."""
    del sort_by_morton, verbose
    return _render_ref_layout(x, y, mass, h, resolution, gridsize)


def render_gpu(x, y, mass, h, resolution: int = 512,
               gridsize: float = 200.0, chunk_size: int = 5_000_000,
               sort_by_morton: bool = False, verbose: bool = False):
    """Drop-in for the reference ``render_gpu`` (sph_kernels.py:532):
    same splat as :func:`render_cpu` (one jitted kernel serves both)."""
    del chunk_size, sort_by_morton, verbose
    return _render_ref_layout(x, y, mass, h, resolution, gridsize)
