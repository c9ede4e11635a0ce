"""Potential modifiers: Shifted, Scaled, Evolving (Agama semantics).

Reference-equivalent (reference: _potential.py — ShiftedPotentialGPU
:1829, ScaledPotentialGPU :1941, EvolvingPotentialGPU :1714).  All
time interpolation is precomputed into jittable piecewise polynomials so
the modifiers trace into the scanned KDK step with no host round-trips.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

from ..utils.interp import (JaxPPoly, hermite_coeffs, pchip_coeffs,
                            spline_coeffs)
from .base import Potential

__all__ = ["ShiftedPotential", "ScaledPotential", "EvolvingPotential"]


class ShiftedPotential(Potential):
    """Evaluate ``inner`` at ``xyz - center(t)``.

    center: (3,) static | (T, 4) rows [t,x,y,z] (cubic spline) |
    (T, 7) rows [t,x,y,z,vx,vy,vz] (cubic Hermite).  Clamped outside the
    time range.
    """

    def __init__(self, inner: Potential, center):
        self.inner = inner
        arr = np.asarray(center, dtype=float)
        if arr.ndim == 1 and arr.shape == (3,):
            self.static_center = jnp.asarray(arr)
            self.traj = None
            self.time_dependent = inner.time_dependent
        elif arr.ndim == 2 and arr.shape[1] in (4, 7):
            order = np.argsort(arr[:, 0])
            arr = arr[order]
            if arr.shape[1] >= 7:
                self.traj = hermite_coeffs(arr[:, 0], arr[:, 1:4],
                                           arr[:, 4:7])
            else:
                self.traj = spline_coeffs(arr[:, 0], arr[:, 1:4])
            self.static_center = None
            self.time_dependent = True
        else:
            raise ValueError(
                "center must be (3,), (T,4) [t,xyz] or (T,7) [t,xyz,vxyz]; "
                f"got shape {arr.shape}"
            )

    def center(self, t):
        if self.traj is None:
            return self.static_center
        return self.traj(t)

    def phi_point(self, xyz, t):
        return self.inner.phi_point(xyz - self.center(t), t)

    def _phi_v(self, arr, t):
        return self.inner._phi_v(arr - self.center(t)[None, :], t)

    def _force_v(self, arr, t):
        return self.inner._force_v(arr - self.center(t)[None, :], t)

    def _hess_v(self, arr, t):
        return self.inner._hess_v(arr - self.center(t)[None, :], t)

    def _phi_force_v(self, arr, t):
        return self.inner._phi_force_v(arr - self.center(t)[None, :], t)


class ScaledPotential(Potential):
    """Agama 'scale' modifier: Phi'(x, t) = a(t) s(t) Phi(x s(t)) with
    s = 1/scale (potential_composite.cpp conventions: force scales as
    a s^2, hessian as a s^3 — recovered here automatically by autodiff
    through the coordinate scaling).

    scale: float | (T,2) rows [t, scale] | (T,3) rows [t, ampl, scale];
    monotone (PCHIP) cubics, clamped outside the table range — schedule
    tables are often near-step (mass-on windows, dissolution ramps),
    where a not-a-knot spline rings by orders of magnitude and linear
    extrapolation runs sign-negative past the last node.
    """

    def __init__(self, inner: Potential, scale, ampl: float = 1.0):
        self.inner = inner
        arr = None if np.isscalar(scale) else np.asarray(scale, float)
        if arr is None or arr.ndim == 0:
            self.scale_spl = None
            self.ampl_spl = None
            self.scale_val = float(scale)
            self.ampl_val = float(ampl)
            self.time_dependent = inner.time_dependent
            return
        if arr.ndim != 2 or arr.shape[1] not in (2, 3):
            raise ValueError(
                "scale must be float, (T,2) [t,scale] or (T,3) "
                f"[t,ampl,scale]; got shape {arr.shape}"
            )
        arr = arr[np.argsort(arr[:, 0])]
        self.scale_spl = pchip_coeffs(arr[:, 0], arr[:, -1],
                                      extrapolate="clamp")
        if arr.shape[1] == 3:
            self.ampl_spl = pchip_coeffs(arr[:, 0], arr[:, 1],
                                         extrapolate="clamp")
            self.ampl_val = None
        else:
            self.ampl_spl = None
            self.ampl_val = float(ampl)
        self.scale_val = None
        self.time_dependent = True

    def _factors(self, t):
        if self.scale_spl is None:
            s = 1.0 / self.scale_val
            a = self.ampl_val
        else:
            s = 1.0 / self.scale_spl(t)
            a = (self.ampl_val if self.ampl_spl is None
                 else self.ampl_spl(t))
        return a, s

    def phi_point(self, xyz, t):
        a, s = self._factors(t)
        return a * s * self.inner.phi_point(xyz * s, t)

    def _phi_v(self, arr, t):
        a, s = self._factors(t)
        return a * s * self.inner._phi_v(arr * s, t)

    def _force_v(self, arr, t):
        a, s = self._factors(t)
        return a * s * s * self.inner._force_v(arr * s, t)

    def _hess_v(self, arr, t):
        a, s = self._factors(t)
        return a * s * s * s * self.inner._hess_v(arr * s, t)

    def _phi_force_v(self, arr, t):
        a, s = self._factors(t)
        phi, f = self.inner._phi_force_v(arr * s, t)
        return a * s * phi, a * s * s * f


class EvolvingPotential(Potential):
    """Linear (or nearest) interpolation between snapshot potentials.

    Jittable: the bracketing interval is selected with lax.switch over
    precompiled per-interval branches, so the evolving potential works
    inside the scanned integrator (the reference dispatches host-side
    per call, _potential.py:1737-1760).

    Homogeneous Multipole sequences (the FIRE workflow: dozens of
    snapshot fits sharing labels and radial grid) take a *stacked* fast
    path instead: the per-snapshot quintic coefficient tensors are
    stacked on a leading time axis and lerped at evaluation time, so
    the compiled graph traces ONE radial evaluation instead of
    O(n_snapshots) switch branches (r1 review weak #8: a dozens-long
    FIRE sequence blew up compile time).  The quintic construction is
    linear in the tables, so lerping precomputed coefficients equals
    building from lerped tables; the monopole uses plain (non-invPhi0)
    scaling for this linearity (~1e-8-class instead of ~1e-9 inside the
    radial grid — far below the >1% BFE fitting error of snapshot
    data).  Beyond the radial grid the stacked path extrapolates each
    snapshot with its plain single power law (evaluated per bracketing
    snapshot and lerped — exponents are NOT lerped), which can deviate
    %-level from the scaled two-term asymptotes; fit to an r_max that
    covers the region of interest.
    """

    time_dependent = True

    def __init__(self, potentials, times, interpolate: bool = True):
        if len(potentials) != len(times):
            raise ValueError(
                f"len(potentials)={len(potentials)} != len(times)="
                f"{len(times)}"
            )
        if len(potentials) < 1:
            raise ValueError("need at least one snapshot potential")
        order = np.argsort(np.asarray(times, float))
        t_sorted = np.asarray(times, float)[order]
        if len(t_sorted) > 1 and (np.diff(t_sorted) <= 0).any():
            # duplicate epochs make the lerp weight 0/0 = NaN and every
            # force silently NaN (easy with FIRE snapshot lists holding
            # a repeated output) — reject up front
            dup = t_sorted[:-1][np.diff(t_sorted) <= 0]
            raise ValueError(
                f"snapshot times must be distinct; duplicated: {dup[:5]}")
        self.pots = [potentials[i] for i in order]
        self.times = jnp.asarray(t_sorted)
        self.interpolate = bool(interpolate)
        self._stacked = None
        if self.interpolate and len(self.pots) >= 3:
            self._stacked = self._try_stack_multipole()
            if self._stacked is None:
                self._stacked = self._try_stack_cylspline()

    def _try_stack_multipole(self):
        """Stack homogeneous Multipole snapshots for O(1)-trace eval."""
        from .multipole import MultipolePotential

        if not all(isinstance(p, MultipolePotential) for p in self.pots):
            return None
        g0 = np.asarray(self.pots[0].x_grid)
        if not all(np.asarray(p.x_grid).shape == g0.shape
                   and np.allclose(np.asarray(p.x_grid), g0)
                   for p in self.pots[1:]):
            return None
        # rebuild with the linear (plain-column) construction
        plain = [MultipolePotential(p.coefs, monopole_scaling=False)
                 for p in self.pots]
        if not all(p.labels == plain[0].labels for p in plain[1:]):
            return None
        return {
            "kind": "multipole",
            "template": plain[0],
            "coeffs": jnp.stack([p.coeffs for p in plain]),
            "f_in": jnp.stack([p.f_in for p in plain]),
            "v_in": jnp.stack([p.v_in for p in plain]),
            "f_out": jnp.stack([p.f_out for p in plain]),
            "v_out": jnp.stack([p.v_out for p in plain]),
        }

    def _try_stack_cylspline(self):
        """Stack homogeneous CylSpline snapshots (FIRE star/gas
        sequences): lerp the bicubic node tensors and outer PowerLaw
        coefficients in time — both constructions are linear in the
        tables once log-scaling/pruning are disabled and the asinh
        rscale is shared."""
        from .cylspline import CylSplinePotential

        if not all(isinstance(p, CylSplinePotential) for p in self.pots):
            return None
        c0 = self.pots[0].coefs
        r0 = np.asarray(c0.R_grid)
        z0 = np.asarray(c0.z_grid)
        m0 = [int(m) for m in c0.m_values]
        for p in self.pots[1:]:
            c = p.coefs
            if (np.asarray(c.R_grid).shape != r0.shape
                    or not np.allclose(np.asarray(c.R_grid), r0)
                    or np.asarray(c.z_grid).shape != z0.shape
                    or not np.allclose(np.asarray(c.z_grid), z0)
                    or [int(m) for m in c.m_values] != m0):
                return None
        if len({p.lmax_outer for p in self.pots}) != 1:
            return None
        rscale = self.pots[0].rscale       # shared asinh scale
        plain = [CylSplinePotential(p.coefs, log_scaling=False,
                                    lmax_outer=self.pots[0].lmax_outer,
                                    rscale=rscale, prune=False)
                 for p in self.pots]
        if not all(p.m_vals == plain[0].m_vals
                   and p.outer_labels == plain[0].outer_labels
                   for p in plain[1:]):
            return None
        return {
            "kind": "cylspline",
            "template": plain[0],
            "nodes": jnp.stack([p.nodes for p in plain]),
            "outer_w": jnp.stack([p.outer_w for p in plain]),
        }

    def _stacked_phi_point(self, xyz, t):
        if self._stacked["kind"] == "cylspline":
            i, alpha = self._weights(t)
            st = self._stacked
            nodes = (1.0 - alpha) * st["nodes"][i] \
                + alpha * st["nodes"][i + 1]
            outer_w = (1.0 - alpha) * st["outer_w"][i] \
                + alpha * st["outer_w"][i + 1]
            return st["template"].phi_point(xyz, t, nodes=nodes,
                                            outer_w=outer_w)
        from .multipole import _radial_plain

        tmpl = self._stacked["template"]
        st = self._stacked
        i, alpha = self._weights(t)
        eps = 1e-30
        r2 = xyz[0] ** 2 + xyz[1] ** 2 + xyz[2] ** 2 + eps
        r = jnp.sqrt(r2)
        rc = jnp.sqrt(xyz[0] ** 2 + xyz[1] ** 2 + eps)

        # evaluate BOTH bracketing snapshots and lerp the results: the
        # interior quintic is linear in the coefficient tables (lerping
        # inputs == lerping outputs), but the power-law extrapolation
        # f*exp(v*d) is NOT linear in the exponent v — lerping v gives
        # wrong values beyond the radial grid (r2 review)
        def rad(k):
            return _radial_plain(jnp.log(r), tmpl.x_grid, st["coeffs"][k],
                                 st["f_in"][k], st["v_in"][k],
                                 st["f_out"][k], st["v_out"][k],
                                 tmpl.x0, tmpl.x1)[0]

        radial = (1.0 - alpha) * rad(i) + alpha * rad(i + 1)
        ang = tmpl._angular(xyz[2] / r, rc / r, xyz[0] / rc,
                            xyz[1] / rc)
        return jnp.sum(radial * ang)

    def _weights(self, t):
        """(interval index, alpha in [0,1]) with clamping."""
        n = self.times.shape[0]
        if n == 1:
            return 0, jnp.asarray(0.0)
        t = jnp.clip(t, self.times[0], self.times[-1])
        i = jnp.clip(jnp.searchsorted(self.times, t, side="right") - 1,
                     0, n - 2)
        alpha = (t - self.times[i]) / (self.times[i + 1] - self.times[i])
        return i, alpha

    def _dispatch(self, method, arr, t):
        n = len(self.pots)
        if n == 1:
            return getattr(self.pots[0], method)(arr, t)
        i, alpha = self._weights(t)
        if not self.interpolate:
            nearest = jnp.where(alpha > 0.5, i + 1, i)
            branches = [
                (lambda k: lambda a: getattr(self.pots[k], method)(a, t))(k)
                for k in range(n)
            ]
            return lax.switch(nearest, branches, arr)
        branches = [
            (lambda k: lambda operand: (
                (1.0 - operand[1])
                * getattr(self.pots[k], method)(operand[0], t)
                + operand[1]
                * getattr(self.pots[k + 1], method)(operand[0], t)
            ))(k)
            for k in range(n - 1)
        ]
        return lax.switch(i, branches, (arr, alpha))

    def phi_point(self, xyz, t):
        if self._stacked is not None:
            return self._stacked_phi_point(xyz, t)
        return self._dispatch("_phi_v", xyz[None, :], t)[0]

    def _phi_v(self, arr, t):
        if self._stacked is not None:
            return Potential._phi_v(self, arr, t)
        return self._dispatch("_phi_v", arr, t)

    def _force_v(self, arr, t):
        if self._stacked is not None:
            return Potential._force_v(self, arr, t)
        return self._dispatch("_force_v", arr, t)

    def _hess_v(self, arr, t):
        if self._stacked is not None:
            return Potential._hess_v(self, arr, t)
        return self._dispatch("_hess_v", arr, t)
