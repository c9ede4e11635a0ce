"""SPH surface-density rendering — on-device, scatter-add formulation.

TPU-native redesign of the reference's renderer (reference:
viz/sph_kernels.py:118-775 — Numba-CUDA atomic scatter / Numba-prange
gather).  Here each particle deposits a 2-D cubic-spline kernel footprint
onto a fixed (2K+1)^2 pixel stencil via XLA scatter-adds: deterministic,
race-free by construction (XLA serialises scatter), and jittable.
Smoothing lengths come from kNN distances: the native C++ host-ops
library (Morton pre-sort + grid-hash kNN, ``nbody_streams_tpu.native``)
when built, else SciPy cKDTree (the reference's CPU path,
sph_kernels.py:118-275).  On this container's single core the native
grid kNN wins on quasi-uniform data and loses to cKDTree on strongly
clustered data, so it is only used for large N where its O(N) hashing
amortises; pass ``method=`` to force either.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "get_smoothing_lengths",
    "render_surface_density",
    "sph_kernel_2d",
]


def get_smoothing_lengths(pos, n_neighbors: int = 32,
                          method: str = "auto", *, k_neighbors=None,
                          safety_factor=None, gpu_vram_threshold_gb=None,
                          verbose: bool = False):
    """Per-particle smoothing length = distance to the n-th neighbour.

    method: 'auto' | 'native' (C++ grid-hash kNN) | 'ckdtree'.

    Reference compatibility (viz/sph_kernels.py:118): ``k_neighbors``
    counts the particle itself (h = distance to the (k-1)-th *other*
    particle) and maps to ``n_neighbors = k_neighbors - 1``;
    ``safety_factor`` / ``gpu_vram_threshold_gb`` / ``verbose`` are
    CUDA VRAM-budget knobs with no TPU analogue — accepted and ignored.
    """
    if k_neighbors is not None:
        n_neighbors = int(k_neighbors) - 1
    del safety_factor, gpu_vram_threshold_gb, verbose
    pos = np.asarray(pos, float)
    if method not in ("auto", "native", "ckdtree"):
        raise ValueError(f"unknown kNN method {method!r}")
    use_native = method == "native"
    if method == "auto" and len(pos) >= 500_000:
        from .. import native

        use_native = native.native_available()
    if use_native:
        from .. import native

        if not native.native_available():
            raise RuntimeError(
                "native host-ops library not built; run "
                "`nbody-build-tree` or use method='ckdtree'")
        if pos.shape[1] == 2:
            # the C kernels read (N, 3) buffers; a zero z column keeps
            # the 2-D distances exact
            pos = np.column_stack([pos, np.zeros(len(pos))])
        order = native.morton_argsort(pos)   # locality for the grid hash
        h = np.empty(len(pos))
        h[order] = native.knn_radius(pos[order], k=n_neighbors)
        return h
    if len(pos) <= 1:
        # a lone particle has no neighbours: cKDTree.query(k=1) returns
        # a 1-D array and d[:, -1] would IndexError
        return np.zeros(len(pos))
    from scipy.spatial import cKDTree

    tree = cKDTree(pos)
    d, _ = tree.query(pos, k=min(n_neighbors + 1, len(pos)))
    return d[:, -1]


def sph_kernel_2d(q):
    """2-D cubic-spline kernel W(q), normalised: integral over the plane
    of W(r/h)/h^2 d^2r = 1 (sigma_2D = 10/(7 pi))."""
    sigma = 10.0 / (7.0 * jnp.pi)
    q = jnp.asarray(q)
    w = jnp.where(
        q < 1.0,
        1.0 - 1.5 * q**2 + 0.75 * q**3,
        jnp.where(q < 2.0, 0.25 * (2.0 - q) ** 3, 0.0),
    )
    return sigma * w


@functools.partial(jax.jit, static_argnames=("nx", "ny", "stencil"))
def _splat(x, y, m, h, x0, y0, dx_pix, dy_pix, nx, ny, stencil):
    """Scatter-add cubic-spline footprints onto the grid (pixels may be
    rectangular: dx_pix and dy_pix are independent)."""
    # particle cell coordinates (fractional)
    fx = (x - x0) / dx_pix
    fy = (y - y0) / dy_pix
    ix = jnp.floor(fx).astype(jnp.int32)
    iy = jnp.floor(fy).astype(jnp.int32)
    # clamp h: support must reach past the nearest pixel centre (up to
    # half the pixel diagonal away, else wsum == 0 and the particle
    # vanishes) and fit inside the stencil on the finer axis
    p_min = jnp.minimum(dx_pix, dy_pix)
    h_lo = jnp.sqrt(dx_pix**2 + dy_pix**2)
    h_w = jnp.clip(h, h_lo, jnp.maximum((stencil / 2.0) * p_min, h_lo))

    grid = jnp.zeros((nx, ny), x.dtype)
    # accumulate per-particle normalisation so each particle deposits
    # exactly its mass (discrete kernel sums != 1 for small h)
    wsum = jnp.zeros_like(x)
    half = stencil // 2
    offsets = [(a, b) for a in range(-half, half + 1)
               for b in range(-half, half + 1)]
    ws = []
    for (a, b) in offsets:
        px = ix + a
        py = iy + b
        r = jnp.sqrt(((px + 0.5 - fx) * dx_pix) ** 2
                     + ((py + 0.5 - fy) * dy_pix) ** 2)
        w = sph_kernel_2d(r / (0.5 * h_w))
        ws.append((px, py, w))
        wsum = wsum + w
    wnorm = jnp.where(wsum > 0, 1.0 / wsum, 0.0)
    for (px, py, w) in ws:
        valid = (px >= 0) & (px < nx) & (py >= 0) & (py < ny)
        contrib = jnp.where(valid, m * w * wnorm, 0.0)
        grid = grid.at[jnp.clip(px, 0, nx - 1),
                       jnp.clip(py, 0, ny - 1)].add(contrib)
    return grid


_REF_RENDER_KWARGS = frozenset((
    "h", "resolution", "gridsize", "chunk_size", "k_neighbors",
    "sort_by_morton", "verbose"))


def render_surface_density(pos, mass, extent=None, npix: int = 256,
                           axes=(0, 1), smoothing=None,
                           n_neighbors: int = 32, stencil: int = 9,
                           arch: str = "auto", **compat):
    """Projected surface density map [Msun/kpc^2].

    Native form: ``render_surface_density(pos (N,3), mass, extent=,
    npix=, ...)`` -> (image (npix, npix) with rows along y for
    ``imshow(origin='lower')``, extent 4-tuple).

    The reference call form (viz/sph_kernels.py:638) is also accepted:
    ``render_surface_density(x, y, mass, h=None, resolution=512,
    gridsize=200.0, ...)`` — detected by a 1-D first argument — and
    returns the reference contract: grid shape (resolution, resolution)
    with rows along **x** (the reference's ``grid[i, j]`` layout,
    sph_kernels.py:378) over ``[-gridsize/2, gridsize/2]`` bounds.
    ``chunk_size``/``sort_by_morton``/``verbose`` are CUDA tiling knobs
    with no TPU analogue — accepted and ignored.  ``k_neighbors``
    counts the particle itself (maps to ``n_neighbors - 1``).
    """
    unknown = set(compat) - _REF_RENDER_KWARGS
    if unknown:
        raise TypeError(f"unexpected kwargs: {sorted(unknown)}")
    pos = np.asarray(pos, float)
    if pos.ndim == 1:
        # reference positional form: (x, y, mass, ...)
        x, y = pos, np.asarray(mass, float)
        if extent is None:
            raise TypeError(
                "reference call form render_surface_density(x, y, mass, "
                "...) requires the mass array as the third argument")
        m = np.asarray(extent, float)
        if not (x.shape == y.shape == m.shape):
            raise ValueError(
                f"x, y, mass must have the same length; got {x.shape}, "
                f"{y.shape}, {m.shape}")
        gridsize = float(compat.get("gridsize", 200.0))
        half = gridsize / 2.0
        img, bounds = _render_native(
            np.column_stack([x, y]), m,
            extent=(-half, half, -half, half),
            npix=int(compat.get("resolution", 512)), axes=(0, 1),
            smoothing=compat.get("h"),
            n_neighbors=int(compat.get("k_neighbors", 32)) - 1,
            stencil=stencil,
            arch="auto" if arch == "gpu" else arch)
        return img.T, bounds          # back to the reference [ix, iy]
    if compat:
        if "resolution" in compat:
            npix = int(compat["resolution"])
        if "gridsize" in compat:
            half = float(compat["gridsize"]) / 2.0
            extent = (-half, half, -half, half)
        if compat.get("h") is not None:
            smoothing = compat["h"]
        if "k_neighbors" in compat:
            n_neighbors = int(compat["k_neighbors"]) - 1
    return _render_native(pos, mass, extent, npix, axes, smoothing,
                          n_neighbors, stencil, arch)


def _render_native(pos, mass, extent=None, npix: int = 256,
                   axes=(0, 1), smoothing=None,
                   n_neighbors: int = 32, stencil: int = 9,
                   arch: str = "auto"):
    pos = np.asarray(pos, float)
    n = pos.shape[0]
    mass = np.broadcast_to(np.asarray(mass, float), (n,))
    i, j = axes
    x = pos[:, i]
    y = pos[:, j]
    if extent is None:
        lim = np.percentile(np.abs(np.concatenate([x, y])), 99.0) * 1.2
        if not np.isfinite(lim) or lim <= 0:
            raise ValueError(
                "cannot auto-size the map: the 99th percentile of the "
                f"projected coordinates is {lim!r} (degenerate or "
                "non-finite positions); pass extent= explicitly")
        extent = (-lim, lim, -lim, lim)
    x0, x1, y0, y1 = extent
    dx_pix = (x1 - x0) / npix
    dy_pix = (y1 - y0) / npix
    if dx_pix <= 0 or dy_pix <= 0:
        raise ValueError(f"empty extent {extent}: x1 > x0 and y1 > y0 "
                         "required")
    if smoothing is None:
        smoothing = get_smoothing_lengths(pos[:, [i, j]],
                                          n_neighbors=n_neighbors)
    smoothing = np.broadcast_to(np.asarray(smoothing, float), (n,))

    img = _splat(
        jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
        jnp.asarray(mass, jnp.float32), jnp.asarray(smoothing, jnp.float32),
        jnp.asarray(x0, jnp.float32), jnp.asarray(y0, jnp.float32),
        jnp.asarray(dx_pix, jnp.float32), jnp.asarray(dy_pix, jnp.float32),
        npix, npix, stencil,
    )
    # mass per pixel -> surface density
    return np.asarray(img).T / (dx_pix * dy_pix), extent
