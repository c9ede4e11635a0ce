"""Coordinate and vector-field transforms (reference: coords/transforms.py).

Conventions (identical to the reference):
* spherical: (rho, theta, phi) with theta = colatitude from +z and
  phi in [0, 2 pi) (``mollweide=True`` maps phi to (-pi, pi] for healpy),
* cylindrical: (R, phi, z),
* NaNs propagate row-wise.
"""
from __future__ import annotations

import numpy as np

__all__ = ["convert_coords", "convert_vectors", "convert_to_vel_los"]

_SYSTEMS = ("cart", "sph", "cyl")


def _as_rows(arr):
    """Flatten (..., 3) to (M, 3); returns (rows, lead_shape)."""
    arr = np.asarray(arr, float)
    if arr.ndim == 0 or arr.shape[-1] != 3:
        raise ValueError(f"expected (..., 3), got {arr.shape}")
    return arr.reshape(-1, 3), arr.shape[:-1]


def _nan_rows(inp, out):
    bad = ~np.isfinite(inp).all(axis=-1)
    out[bad] = np.nan
    return out


def _to_cart(coords, system, mollweide):
    if system == "cart":
        return coords.copy()
    if system == "sph":
        rho, th, ph = coords[:, 0], coords[:, 1], coords[:, 2]
        if mollweide:
            ph = np.where(ph < 0, ph + 2 * np.pi, ph)
        st = np.sin(th)
        return np.column_stack([rho * st * np.cos(ph),
                                rho * st * np.sin(ph),
                                rho * np.cos(th)])
    # cyl
    r, ph, z = coords[:, 0], coords[:, 1], coords[:, 2]
    return np.column_stack([r * np.cos(ph), r * np.sin(ph), z])


def _from_cart(xyz, system, mollweide):
    if system == "cart":
        return xyz.copy()
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    phi = np.mod(np.arctan2(y, x), 2 * np.pi)
    if system == "sph":
        rxy = np.hypot(x, y)
        if mollweide:
            phi = np.where(phi > np.pi, phi - 2 * np.pi, phi)
        return np.column_stack([np.sqrt(rxy**2 + z**2),
                                np.arctan2(rxy, z), phi])
    return np.column_stack([np.hypot(x, y), phi, z])


def convert_coords(coords, from_sys: str, to_sys: str,
                   mollweide: bool = False):
    """Convert points between 'cart', 'sph' and 'cyl' systems."""
    if from_sys not in _SYSTEMS or to_sys not in _SYSTEMS:
        raise ValueError(
            f"coordinate systems must be one of {_SYSTEMS}, got "
            f"{from_sys!r} -> {to_sys!r}"
        )
    arr, lead = _as_rows(coords)
    if from_sys == to_sys:
        out = arr.copy()
    else:
        out = _from_cart(_to_cart(arr, from_sys, mollweide), to_sys,
                         mollweide)
    out = _nan_rows(arr, out)
    return out.reshape(lead + (3,))


def _sph_basis(theta, phi):
    """Rows: (r-hat, theta-hat, phi-hat) as (N, 3, 3)."""
    st, ct = np.sin(theta), np.cos(theta)
    sp, cp = np.sin(phi), np.cos(phi)
    basis = np.empty((len(theta), 3, 3))
    basis[:, 0] = np.column_stack([st * cp, st * sp, ct])
    basis[:, 1] = np.column_stack([ct * cp, ct * sp, -st])
    basis[:, 2] = np.column_stack([-sp, cp, np.zeros_like(sp)])
    return basis


def _cyl_basis(phi):
    """Rows: (R-hat, phi-hat, z-hat) as (N, 3, 3)."""
    sp, cp = np.sin(phi), np.cos(phi)
    basis = np.zeros((len(phi), 3, 3))
    basis[:, 0] = np.column_stack([cp, sp, np.zeros_like(sp)])
    basis[:, 1] = np.column_stack([-sp, cp, np.zeros_like(sp)])
    basis[:, 2, 2] = 1.0
    return basis


def convert_vectors(vectors, positions, from_sys: str, to_sys: str,
                    position_system: str = "cart",
                    mollweide: bool = False):
    """Convert a vector field (e.g. velocities) between bases.

    Components: cart (vx, vy, vz); sph (v_r, v_theta, v_phi);
    cyl (v_R, v_phi, v_z).  ``positions`` are given in
    ``position_system`` coordinates.
    """
    if from_sys not in _SYSTEMS or to_sys not in _SYSTEMS:
        raise ValueError(
            f"vector systems must be one of {_SYSTEMS}, got "
            f"{from_sys!r} -> {to_sys!r}"
        )
    vec, lead = _as_rows(vectors)
    pos, plead = _as_rows(positions)
    if plead != lead:
        raise ValueError(
            f"positions shape {plead + (3,)} does not match vectors "
            f"shape {lead + (3,)}")
    xyz = _to_cart(pos, position_system, mollweide)
    sph = _from_cart(xyz, "sph", False)
    theta, phi = sph[:, 1], sph[:, 2]

    def basis(system):
        if system == "cart":
            return np.broadcast_to(np.eye(3), (len(xyz), 3, 3))
        if system == "sph":
            return _sph_basis(theta, phi)
        return _cyl_basis(phi)

    v_cart = np.einsum("nij,ni->nj", basis(from_sys), vec) \
        if from_sys != "cart" else vec
    out = np.einsum("nij,nj->ni", basis(to_sys), v_cart) \
        if to_sys != "cart" else np.array(v_cart, copy=True)
    # NaN propagation over BOTH inputs: a NaN position corrupts the
    # basis even when the output basis happens not to use that
    # coordinate, so the whole row must go NaN
    out = _nan_rows(np.concatenate([vec, pos], axis=1),
                    np.asarray(out, float))
    return out.reshape(lead + (3,))


def convert_to_vel_los(positions, velocities, observer=None):
    """Line-of-sight velocity relative to an observer (default origin)."""
    pos, lead = _as_rows(positions)
    vel, _ = _as_rows(velocities)
    if observer is not None:
        obs = np.asarray(observer, float)
        pos = pos - obs[:3]
        if obs.size >= 6:
            vel = vel - obs[3:6]
    r = np.linalg.norm(pos, axis=1)
    los = np.sum(pos * vel, axis=1) / np.maximum(r, 1e-30)
    return los.reshape(lead) if lead else los[0]
