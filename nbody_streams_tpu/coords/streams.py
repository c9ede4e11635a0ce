"""Stream-aligned coordinate frames (reference: coords/streams.py).

(phi1, phi2) great-circle frames defined by the progenitor's angular
momentum: z-hat along L, x-hat toward the progenitor, phi1 along the
stream and phi2 the perpendicular offset; optional optimizer rotation to
minimise the phi2 spread; full observable sets (distance, proper
motions, v_los) for a given observer.
"""
from __future__ import annotations

import numpy as np

from .transforms import convert_to_vel_los

__all__ = [
    "generate_stream_coords",
    "to_stream_coords",
    "get_observed_stream_coords",
]


def _stream_rotation(xv_prog):
    """(3, 3) rotation with rows (x-hat, y-hat, z-hat): z along L,
    x toward the progenitor."""
    pos = np.asarray(xv_prog[:3], float)
    vel = np.asarray(xv_prog[3:6], float)
    ang = np.cross(pos, vel)
    zhat = ang / (np.linalg.norm(ang) + 1e-300)
    xhat = pos / (np.linalg.norm(pos) + 1e-300)
    xhat = xhat - zhat * np.dot(xhat, zhat)
    xhat /= np.linalg.norm(xhat) + 1e-300
    yhat = np.cross(zhat, xhat)
    return np.stack([xhat, yhat, zhat])


def _angles(pos, rot, degrees):
    proj = pos @ rot.T
    phi1 = np.arctan2(proj[:, 1], proj[:, 0])
    phi2 = np.arcsin(np.clip(
        proj[:, 2] / (np.linalg.norm(proj, axis=1) + 1e-300), -1, 1))
    if degrees:
        phi1, phi2 = np.rad2deg(phi1), np.rad2deg(phi2)
    return phi1, phi2


def generate_stream_coords(xv, xv_prog=None, return_rotation: bool = False,
                           degrees: bool = True,
                           optimizer_fit: bool = False,
                           fit_kwargs: dict | None = None):
    """(phi1, phi2)[, R] for one stream or a stack of streams.

    xv: (N, 6) or (S, N, 6); xv_prog: (6,) / (S, 6) / None (auto: the
    particle nearest the median position).
    """
    xv = np.asarray(xv, float)
    single = xv.ndim == 2
    if single:
        xv = xv[None]
    if xv.ndim != 3 or xv.shape[-1] != 6:
        raise ValueError(f"xv must be (N, 6) or (S, N, 6), got {xv.shape}")
    n_streams = xv.shape[0]

    if xv_prog is None or np.size(xv_prog) == 0:
        # NaN rows (spray particles not yet released at this snapshot)
        # must not poison the auto progenitor: nanmedian + NaN -> inf
        # distances keeps the selection on the released particles
        with np.errstate(invalid="ignore"):
            med = np.nanmedian(xv[:, :, :3], axis=1)
            d = np.linalg.norm(xv[:, :, :3] - med[:, None, :], axis=2)
        if np.isnan(med).any():
            raise ValueError(
                "cannot auto-select a progenitor: a stream has no "
                "finite particle rows; pass xv_prog=")
        idx = np.argmin(np.where(np.isnan(d), np.inf, d), axis=1)
        progs = xv[np.arange(n_streams), idx]
    else:
        progs = np.atleast_2d(np.asarray(xv_prog, float))
        if progs.shape[0] == 1 and n_streams > 1:
            progs = np.repeat(progs, n_streams, axis=0)
        if progs.shape != (n_streams, 6):
            raise ValueError(
                f"xv_prog shape {np.shape(xv_prog)} does not match "
                f"{n_streams} stream(s): expected (6,) or "
                f"({n_streams}, 6) — a misaligned progenitor array "
                "would silently pair the wrong progenitor with a stream")

    phi1s, phi2s, rots = [], [], []
    for s in range(n_streams):
        rot = _stream_rotation(progs[s])
        if optimizer_fit:
            from scipy.optimize import minimize_scalar

            pos = xv[s, :, :3]

            def spread(alpha):
                c, si = np.cos(alpha), np.sin(alpha)
                # rotate about x-hat in the (y, z) plane
                r2 = np.array([[1, 0, 0], [0, c, -si], [0, si, c]]) @ rot
                _, p2 = _angles(pos, r2, False)
                return np.std(p2)

            res = minimize_scalar(spread, bounds=(-np.pi / 4, np.pi / 4),
                                  method="bounded",
                                  **(fit_kwargs or {}))
            c, si = np.cos(res.x), np.sin(res.x)
            rot = np.array([[1, 0, 0], [0, c, -si], [0, si, c]]) @ rot
        p1, p2 = _angles(xv[s, :, :3], rot, degrees)
        phi1s.append(p1)
        phi2s.append(p2)
        rots.append(rot)

    phi1 = np.array(phi1s)
    phi2 = np.array(phi2s)
    rots = np.array(rots)
    if single:
        phi1, phi2, rots = phi1[0], phi2[0], rots[0]
    if return_rotation:
        return phi1, phi2, rots
    return phi1, phi2


def to_stream_coords(xv, rotation, degrees: bool = True):
    """(phi1, phi2, r) of particles in an existing stream frame.

    xv: (N, 6) or (N, 3) positions, or one row (6,) / (3,).
    """
    xv = np.asarray(xv, float)
    single = xv.ndim == 1
    if single:
        xv = xv[None]
    pos = xv[:, :3]
    p1, p2 = _angles(pos, np.asarray(rotation, float), degrees)
    r = np.linalg.norm(pos, axis=1)
    if single:
        return p1[0], p2[0], r[0]
    return p1, p2, r


def get_observed_stream_coords(xv, xv_prog=None, observer=None,
                               degrees: bool = True):
    """Full observable set for a stream in galactocentric coordinates.

    Returns dict with phi1, phi2, dist (from observer), v_los, pm_phi1,
    pm_phi2 (angular velocities along the frame axes, in the same angle
    unit as phi1/phi2 per code time unit: deg/time when ``degrees=True``,
    rad/time = km/s/kpc otherwise).  Default observer at the galactic
    centre.

    phi1/phi2 are GALACTOCENTRIC stream-frame angles (reference
    semantics, coords/streams.py:341), and pm_phi1/pm_phi2 are the time
    derivatives of those same angles — the observer affects only
    ``dist`` and ``v_los``.
    """
    xv = np.asarray(xv, float)
    if xv.ndim != 2 or xv.shape[-1] != 6:
        raise ValueError(
            f"get_observed_stream_coords takes one stream (N, 6), got "
            f"{xv.shape}; loop over streams (or use "
            "generate_stream_coords for stacked frames)")
    phi1, phi2, rot = generate_stream_coords(xv, xv_prog,
                                             return_rotation=True,
                                             degrees=degrees)
    obs = np.zeros(6) if observer is None else np.asarray(observer, float)
    rel_p = xv[:, :3] - obs[:3]
    dist = np.linalg.norm(rel_p, axis=1)
    v_los = convert_to_vel_los(xv[:, :3], xv[:, 3:6], observer=obs)

    # angular velocities of (phi1, phi2): galactocentric, so that
    # pm_phi1 == d(phi1)/dt for the angles returned above
    proj_p = xv[:, :3] @ rot.T
    proj_v = xv[:, 3:6] @ rot.T
    rxy = np.hypot(proj_p[:, 0], proj_p[:, 1]) + 1e-300
    dphi1 = (proj_p[:, 0] * proj_v[:, 1] - proj_p[:, 1] * proj_v[:, 0]) \
        / rxy**2
    r3 = np.linalg.norm(proj_p, axis=1) + 1e-300
    dphi2 = (proj_v[:, 2] * rxy - proj_p[:, 2]
             * (proj_p[:, 0] * proj_v[:, 0] + proj_p[:, 1] * proj_v[:, 1])
             / rxy) / r3**2
    if degrees:
        # keep pm_phi1 == d(phi1)/dt for the angles returned above
        dphi1 = np.rad2deg(dphi1)
        dphi2 = np.rad2deg(dphi2)
    return {
        "phi1": phi1,
        "phi2": phi2,
        "dist": dist,
        "v_los": v_los,
        "pm_phi1": dphi1,
        "pm_phi2": dphi2,
        "rotation": rot,
    }
