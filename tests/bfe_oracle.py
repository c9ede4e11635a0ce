"""Independent BFE oracle: slow, NumPy/SciPy-only harmonic summation.

Breaks the golden-value circularity flagged in the round-2 verdict: the
evaluators under test (MultipolePotential / CylSplinePotential) must
agree with THIS implementation, which shares no code with them —
associated Legendre values come from ``scipy.special.lpmv`` (not the
in-package upward recurrence), radial/2-D interpolation from
``scipy.interpolate`` Hermite splines on the raw tables (not the Agama
quintic/log-scaled construction), and the Fourier/harmonic sums are
written directly from the Agama coefficient-file format definition.

Conventions (the file-format semantics, from the Agama reference docs
and reference _multipole_potential_kernel.cu:1-80):

  Phi(r, theta, phi) = sum_{l,m} Phi_lm(r) * N_m * Ptilde_l^{|m|}(cos
  theta) * T_m(phi),   T_m = cos(|m| phi) for m >= 0, sin(|m| phi) else,
  N_m = 2 sqrt(pi) for m = 0, 2 sqrt(2 pi) otherwise, and Ptilde the
  orthonormalised associated Legendre function with Condon-Shortley
  phase (scipy's lpmv convention).

  CylSpline: Phi(R, z, phi) = sum_m Phi_m(R, z) * T_m(phi).

Exactness: at tabulated grid nodes no interpolation is involved, so the
oracle is exact there up to float64 rounding — node-anchored golden
values carry no model error.  Between nodes the oracle uses cubic
Hermite interpolation of (Phi_lm, dPhi_lm/dr), which differs from the
evaluator's quintic-in-log-r by the grids' interpolation error only.
"""
from __future__ import annotations

import numpy as np
from scipy.interpolate import CubicHermiteSpline
from scipy.special import lpmv

SQRT_PI = np.sqrt(np.pi)


def real_ylm(l, m, cos_theta, phi_angle):
    """Real orthonormalised spherical-harmonic factor N_m P~ T_m."""
    am = abs(m)
    # orthonormalisation of lpmv's P_l^m (which includes the CS phase)
    from math import factorial

    norm = np.sqrt((2 * l + 1) / (4.0 * np.pi)
                   * factorial(l - am) / factorial(l + am))
    p = norm * lpmv(am, l, cos_theta)
    mul = 2.0 * SQRT_PI if m == 0 else 2.0 * SQRT_PI * np.sqrt(2.0)
    trig = np.cos(am * phi_angle) if m >= 0 else np.sin(am * phi_angle)
    return mul * p * trig


def multipole_phi_at_node(coefs, i_node, cos_theta, phi_angle):
    """Phi at tabulated radius R_grid[i_node] — no interpolation."""
    total = 0.0
    phi_tab = np.asarray(coefs.phi, float)
    for c, (l, m) in enumerate(coefs.lm_labels):
        total += phi_tab[i_node, c] * real_ylm(l, m, cos_theta, phi_angle)
    return total


def multipole_phi(coefs, xyz):
    """Phi at arbitrary points: cubic Hermite radial interpolation of the
    (Phi_lm, dPhi_lm/dr) tables + scipy Legendre angular factors."""
    xyz = np.atleast_2d(np.asarray(xyz, float))
    r_grid = np.asarray(coefs.R_grid, float)
    phi_tab = np.asarray(coefs.phi, float)
    dphi_tab = np.asarray(coefs.dphi_dr, float)
    interp = CubicHermiteSpline(r_grid, phi_tab, dphi_tab, axis=0)
    out = np.zeros(xyz.shape[0])
    for k, p in enumerate(xyz):
        r = np.sqrt(p @ p)
        # angular direction from the TRUE point; clamp only the radius
        # handed to the interpolant (else a probe outside the radial
        # grid gets |cos_theta| > 1 and lpmv returns garbage)
        cos_t = p[2] / r if r > 0 else 1.0
        ang = np.arctan2(p[1], p[0])
        vals = interp(min(max(r, r_grid[0]), r_grid[-1]))
        out[k] = sum(
            vals[c] * real_ylm(l, m, cos_t, ang)
            for c, (l, m) in enumerate(coefs.lm_labels))
    return out


def cylspline_phi_at_node(coefs, i_r, i_z, phi_angle):
    """Phi at grid node (R_grid[i_r], z_grid[i_z]) — no interpolation."""
    total = 0.0
    blocks = np.asarray(coefs.phi, float)
    for i, m in enumerate(coefs.m_values):
        am = abs(m)
        trig = np.cos(am * phi_angle) if m >= 0 else np.sin(am * phi_angle)
        total += blocks[i, i_r, i_z] * trig
    return total
