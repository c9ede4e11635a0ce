"""Chandrasekhar dynamical friction — fully jittable on-device term.

TPU-native redesign of the reference's DF implementation
(reference: _chandrasekhar.py:439-838).  The reference runs host-side
NumPy inside a mutable-closure ``force_extra`` with a device round-trip
per step; here the whole term — shrinking-sphere CoM, predictor
extrapolation, sigma(r) lookup, BT2008 eq. 8.13 — is a
:class:`~nbody_streams_tpu.integrate.ForceExtra` whose state threads
through the scanned KDK step (``lax.cond`` selects full-update vs
predictor steps by the global step counter).

Physics preserved exactly:

* a_DF = -4 pi G^2 M_sat rho ln(Lambda)/v^2 [erf(X) - 2X/sqrt(pi)
  exp(-X^2)] v_hat with X = v/(sqrt(2) sigma(r))
* Coulomb log 'variable' ln(r v^2/(G M_sat)) clipped at ln(1.1), or
  'fixed'
* Read+2006 core-stalling suppression min(1, (r/r_core)^gamma)
* sigma(r): isotropic Jeans integral tabulated host-side into a
  jittable log-log spline, or the cheap local-circular estimate
  sqrt(r |g_r| / 2) evaluated in-graph, or 'quasispherical' — a native
  Eddington inversion of the host (rho, Phi) into f(E) whose velocity
  moments give sigma_r (the reference delegates this to Agama's
  QuasiSpherical DF machinery, reference :672-680)
* CoM tracking: fixed-iteration shrinking sphere every
  ``update_interval`` steps, kinematic predictor in between; DF applied
  only within ``apply_radius_factor`` x the final sphere radius.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .constants import G_DEFAULT
from .integrate import ForceExtra
from .utils.interp import spline_coeffs

__all__ = [
    "ChandrasekharFriction",
    "make_df_force_extra",
    "chandrasekhar_accel",
    "chandrasekhar_friction",
    "compute_sigma_r",
    "shrinking_sphere_com",
]


# ---------------------------------------------------------------------------
# sigma(r)
# ---------------------------------------------------------------------------

def compute_sigma_r(pot, t_eval: float = 0.0, grid_r=None,
                    method: str = "jeans"):
    """Radial velocity dispersion profile as a jittable callable.

    'jeans': isotropic spherical Jeans equation,
    sigma_r^2(r) = (1/rho) int_r^inf rho(s) |g_r(s)| ds;
    'quasispherical': Eddington-inversion DF moments (see below);
    'local_circular': sqrt(r |g_r| / 2) in-graph.
    The first two tabulate on a log grid and return a clamped log-log
    spline (reference: _chandrasekhar.py:70-266).
    """
    if method not in ("jeans", "local_circular", "quasispherical"):
        raise ValueError(f"unknown sigma method {method!r}")

    if method == "local_circular":
        def sigma(r, t=t_eval):
            p = jnp.stack([r, jnp.zeros_like(r), jnp.zeros_like(r)], -1)
            gr = pot.force(p, t=t)[..., 0]
            return jnp.sqrt(jnp.maximum(0.5 * r * jnp.abs(gr), 1e-12))

        return sigma

    r = (np.asarray(grid_r, float) if grid_r is not None
         else np.geomspace(1e-2, 2e3, 200))
    if method == "quasispherical":
        # extend outward: the Eddington integral sweeps psi -> 0, i.e.
        # radii beyond any truncated grid; evaluating the rho(psi)
        # spline there would be cubic EXTRApolation (divergent junk
        # that the f >= 0 clip turns into sigma collapsing to the
        # floor at large r)
        r = np.concatenate([r, np.geomspace(r.max() * 1.25,
                                            r.max() * 1e3, 32)])
    pts = np.column_stack([r, np.zeros_like(r), np.zeros_like(r)])
    rho = np.maximum(np.asarray(pot.density(pts, t=t_eval), float), 1e-300)

    if method == "quasispherical":
        # Native Eddington inversion (the reference delegates this to
        # Agama's QuasiSpherical DF moments, _chandrasekhar.py:178-266):
        #   f(E) = (8)^{-1/2} pi^{-2} int_0^E (d2rho/dpsi2) dpsi
        #                                     / sqrt(E - psi)
        # with psi = -Phi; then sigma_r^2 = (int f v^4 dv)/(3 int f v^2
        # dv).  For isotropic self-consistent systems this equals the
        # Jeans solution (cross-checked in tests); it differs when the
        # supplied density is a tracer in a deeper host.
        psi = -np.asarray(pot.potential(pts, t=t_eval), float)
        if np.any(np.diff(psi) >= 0):
            raise ValueError(
                "quasispherical sigma needs psi = -Phi monotonically "
                "decreasing in r (is the potential spherical-ish?)")
        if psi[-1] <= 0:
            raise ValueError(
                "quasispherical sigma needs psi = -Phi > 0 on the whole "
                f"grid (psi({r[-1]:.3g}) = {psi[-1]:.3g}): the Eddington "
                "inversion assumes the Agama zero-point Phi(inf) = 0 — "
                "re-anchor the potential (e.g. subtract Phi at a large "
                "radius) or pass a tighter grid_r")
        from scipy.interpolate import CubicSpline

        rho_of_psi = CubicSpline(psi[::-1], rho[::-1])
        _d2 = rho_of_psi.derivative(2)
        psi_lo = psi[-1]

        def d2rho(p):
            # zero-fill below the tabulated range instead of cubic
            # extrapolation: rho -> 0 out there, and extrapolated junk
            # otherwise dominates the lowest-E integrals
            return np.where(p >= psi_lo, _d2(np.maximum(p, psi_lo)), 0.0)

        # f(E) on the psi grid; substitute psi = E(1 - u^2) to remove
        # the inverse-sqrt endpoint singularity
        u, wu = np.polynomial.legendre.leggauss(64)
        u = 0.5 * (u + 1.0)
        wu = 0.5 * wu
        e_grid = psi[::-1]                     # increasing
        vals = d2rho(e_grid[:, None] * (1.0 - u[None, :] ** 2))
        f_e = (2.0 * np.sqrt(e_grid) * (vals * wu[None, :]).sum(1)
               / (np.sqrt(8.0) * np.pi ** 2))
        f_e = np.maximum(f_e, 0.0)             # clip quadrature noise
        # piecewise-linear ln f(ln E): a cubic spline oscillates and
        # overflows exp() across clipped f = 0 stretches (tracer
        # densities in a deeper host can have d2rho/dpsi2 < 0 noise
        # near the outer boundary)
        ln_e_tab = np.log(e_grid)
        ln_f_tab = np.log(f_e + 1e-300)

        def ln_f(e):
            return np.interp(np.log(np.maximum(e, e_grid[0])),
                             ln_e_tab, ln_f_tab)

        # velocity moments at each radius: v in (0, sqrt(2 psi))
        vq, wv = np.polynomial.legendre.leggauss(96)
        vq = 0.5 * (vq + 1.0)
        wv = 0.5 * wv
        sigma2 = np.empty_like(r)
        for i, (ps, _rh) in enumerate(zip(psi, rho)):
            vmax = np.sqrt(2.0 * ps)
            v = vmax * vq
            fE = np.exp(ln_f(np.maximum(ps - 0.5 * v * v, e_grid[0])))
            m2 = (fE * v ** 2 * wv).sum() * vmax
            m4 = (fE * v ** 4 * wv).sum() * vmax
            sigma2[i] = m4 / (3.0 * m2) if m2 > 0 else 0.0
        sigma_tab = np.sqrt(np.maximum(sigma2, 1e-12))
        lnr = np.log(r)
    else:
        g_r = np.abs(np.asarray(pot.force(pts, t=t_eval), float)[:, 0])

        # integrate rho*g from the outside in (log-spaced trapezoid)
        integrand = rho * g_r * r            # d s = s d ln s
        lnr = np.log(r)
        seg = 0.5 * (integrand[1:] + integrand[:-1]) * np.diff(lnr)
        cum_out = np.concatenate([np.cumsum(seg[::-1])[::-1], [0.0]])
        sigma2 = cum_out / rho
        sigma_tab = np.sqrt(np.maximum(sigma2, 1e-12))

    spline = spline_coeffs(lnr, np.log(sigma_tab), extrapolate="clamp")

    def sigma(rq, t=t_eval):
        return jnp.exp(spline(jnp.log(jnp.maximum(rq, 1e-10))))

    return sigma


# ---------------------------------------------------------------------------
# CoM finders
# ---------------------------------------------------------------------------

def bound_center_phi(pos, vel, mass, phi, r_prev, v_prev, dt,
                     r_max: float = 10.0, n_iter: int = 10):
    """Phi-energy iterative bound-particle centre (jittable).

    Reference semantics (_chandrasekhar.py:273-363): predict the centre
    kinematically, take the median phase-space point of particles that
    are bound (phi + |v - v_com|^2/2 < 0) within an aperture, iterate
    with a fixed trip count.  Returns (r_com, v_com, bound_mask,
    M_bound).
    """
    xv = jnp.concatenate([pos, vel], axis=1)
    f0 = jnp.concatenate([r_prev + v_prev * dt, v_prev])

    def body(f_center, _):
        dr2 = jnp.sum((pos - f_center[:3]) ** 2, axis=1)
        vrel2 = jnp.sum((vel - f_center[3:]) ** 2, axis=1)
        bound = (phi + 0.5 * vrel2) < 0.0
        use = bound & (dr2 < r_max * r_max)
        use = use | (jnp.sum(use) < 2)     # degenerate: fall back to all
        med = jnp.nanmedian(
            jnp.where(use[:, None], xv, jnp.nan), axis=0)
        return med, None

    f_center, _ = lax.scan(body, f0, None, length=n_iter)
    vrel2 = jnp.sum((vel - f_center[3:]) ** 2, axis=1)
    bound = (phi + 0.5 * vrel2) < 0.0
    m_bound = jnp.sum(mass * bound)
    return f_center[:3], f_center[3:], bound, m_bound


def shrinking_sphere_com(pos, vel, mass, n_iter: int = 5,
                         frac: float = 0.5):
    """Fixed-iteration shrinking-sphere centre (jittable).

    Returns (r_com, v_com, r_sphere).  Mirrors the reference's behaviour
    (_chandrasekhar.py:370-432) with a static trip count: start from the
    global centre of mass, halve the aperture ``n_iter`` times,
    recomputing the mass-weighted centre of the enclosed particles.
    """
    m = mass
    com = jnp.sum(pos * m[:, None], axis=0) / jnp.sum(m)
    d = jnp.linalg.norm(pos - com, axis=1)
    r = jnp.max(d)

    def body(carry, _):
        com, r = carry
        r_new = r * frac
        d = jnp.linalg.norm(pos - com, axis=1)
        w = m * (d <= r_new)
        wsum = jnp.sum(w)
        # empty aperture (e.g. a disrupted satellite whose weighted
        # centre fell between two clumps): keep the previous centre and
        # aperture — dividing by the 1e-300 floor would snap the CoM to
        # the coordinate origin, i.e. the HOST centre
        ok = wsum > 0
        com = jnp.where(
            ok, jnp.sum(pos * w[:, None], axis=0)
            / jnp.maximum(wsum, 1e-300), com)
        r = jnp.where(ok, r_new, r)
        return (com, r), None

    (com, r), _ = lax.scan(body, (com, r), None, length=n_iter)
    d = jnp.linalg.norm(pos - com, axis=1)
    w = m * (d <= r)
    wsum = jnp.maximum(jnp.sum(w), 1e-300)
    v_com = jnp.sum(vel * w[:, None], axis=0) / wsum
    return com, v_com, r


# ---------------------------------------------------------------------------
# The friction formula
# ---------------------------------------------------------------------------

def chandrasekhar_accel(r_com, v_com, M_sat, rho, sigma, t, G=G_DEFAULT,
                        coulomb_mode: str = "variable",
                        fixed_ln_lambda: float = 3.0,
                        core_gamma: float = 0.0, r_core: float = 1.0):
    """BT2008 eq. 8.13 DF acceleration at the CoM (jittable).

    Batch-aware: ``r_com``/``v_com`` may be (3,) or (N, 3) (with
    ``rho``/``sigma`` scalar or (N,)) — norms are taken along the last
    axis, NOT over the whole batch (a Frobenius norm of (N, 3) input
    would give every orbit one shared, wrong speed)."""
    r = jnp.linalg.norm(r_com, axis=-1)
    v = jnp.linalg.norm(v_com, axis=-1)
    v_safe = jnp.maximum(v, 1e-6)
    x = v_safe / (jnp.sqrt(2.0) * jnp.maximum(sigma, 1e-6))

    if coulomb_mode == "fixed":
        ln_lambda = jnp.asarray(fixed_ln_lambda, r.dtype)
    else:
        b_min = G * M_sat / (v_safe**2 + 1e-30)
        ln_lambda = jnp.log(jnp.maximum(r / (b_min + 1e-9), 1.1))

    bracket = (jax.scipy.special.erf(x)
               - (2.0 / jnp.sqrt(jnp.pi)) * x * jnp.exp(-x * x))
    a_mag = (4.0 * jnp.pi * G * G * M_sat * rho * ln_lambda * bracket
             / (v_safe**2))
    if core_gamma > 0.0:
        a_mag = a_mag * jnp.minimum(
            1.0, (r / r_core) ** core_gamma)
    a = -(v_com / v_safe[..., None]) * a_mag[..., None]
    # vanish when the satellite is at rest or at the exact centre
    live = ((r > 1e-6) & (v > 1e-6))[..., None]
    return jnp.where(live, a, jnp.zeros_like(a))


def chandrasekhar_friction(r_com, v_com, M_sat, pot, sigma_func, t,
                           coulomb_mode: str = "variable",
                           fixed_ln_lambda: float = 3.0,
                           core_gamma: float = 0.0, r_core: float = 1.0,
                           G: float = G_DEFAULT):
    """Drop-in for the reference ``chandrasekhar_friction``
    (reference _chandrasekhar.py:439-523): the host-convenience form that
    looks up the local density from a potential object and the dispersion
    from ``sigma_func(r)``, then evaluates BT2008 eq. 8.13.  Returns a
    NumPy (3,) array like the reference; for an on-device, jittable DF
    term use :func:`chandrasekhar_accel` / :class:`ChandrasekharFriction`.
    """
    r_com = np.asarray(r_com, float)
    v_com = np.asarray(v_com, float)
    r = float(np.linalg.norm(r_com))
    v = float(np.linalg.norm(v_com))
    if r < 1e-6 or v < 1e-6:
        return np.zeros(3)
    rho = float(np.asarray(
        jax.device_get(pot.density(r_com, t))).ravel()[0])
    sigma = float(sigma_func(r))
    return np.asarray(jax.device_get(chandrasekhar_accel(
        r_com, v_com, M_sat, rho, sigma, t, G=G,
        coulomb_mode=coulomb_mode, fixed_ln_lambda=fixed_ln_lambda,
        core_gamma=core_gamma, r_core=r_core)), float)


# ---------------------------------------------------------------------------
# ForceExtra
# ---------------------------------------------------------------------------

class ChandrasekharFriction(ForceExtra):
    """Jittable DF force_extra with threaded CoM state."""

    def __init__(self, pot, M_sat: float, G: float = G_DEFAULT,
                 coulomb_mode: str = "variable",
                 fixed_ln_lambda: float = 3.0, core_gamma: float = 0.0,
                 r_core: float = 1.0, update_interval: int = 10,
                 sigma_method: str = "jeans", apply_radius_factor=2.0,
                 shrink_n_iter: int = 5, shrink_frac: float = 0.5,
                 sigma_grid_r=None, t_start: float = 0.0,
                 t_end: float = 0.0, com_method: str = "shrinking_sphere",
                 bound_r_max: float = 10.0):
        if M_sat <= 0:
            raise ValueError(f"M_sat must be positive, got {M_sat}")
        if update_interval < 1:
            raise ValueError(
                f"update_interval must be >= 1, got {update_interval}")
        if com_method not in ("shrinking_sphere", "bound_phi"):
            raise ValueError(
                f"com_method must be 'shrinking_sphere' or 'bound_phi', "
                f"got {com_method!r}")
        self.com_method = com_method
        self.bound_r_max = float(bound_r_max)
        #: run.py computes the self-gravity potential per step (one extra
        #: O(N^2) pass) when this is True — the reference gets phi for
        #: free only on its tree paths (run_gpu_tree.py:365-370)
        self.needs_phi = com_method == "bound_phi"
        self.pot = pot
        self.M_sat = float(M_sat)
        self.G = float(G)
        self.coulomb_mode = coulomb_mode
        self.fixed_ln_lambda = float(fixed_ln_lambda)
        self.core_gamma = float(core_gamma)
        self.r_core = float(r_core)
        self.update_interval = int(update_interval)
        self.apply_radius_factor = apply_radius_factor
        self.shrink_n_iter = int(shrink_n_iter)
        self.shrink_frac = float(shrink_frac)
        t_mid = 0.5 * (t_start + t_end)
        self.sigma = compute_sigma_r(pot, t_eval=t_mid, grid_r=sigma_grid_r,
                                     method=sigma_method)

    def init_state(self, pos, vel, mass, t):
        com, v_com, r_sph = shrinking_sphere_com(
            pos, vel, mass, self.shrink_n_iter, self.shrink_frac)
        state = {
            "r_com": com,
            "v_com": v_com,
            "r_sphere": r_sph,
            "a_df": jnp.zeros_like(com),
            "t_prev": jnp.asarray(t, pos.dtype),
        }
        if self.com_method == "bound_phi":
            state["m_bound"] = jnp.asarray(self.M_sat, pos.dtype)
            state["bound"] = jnp.ones(pos.shape[0], bool)
        return state

    def __call__(self, state, pos, vel, mass, t, phi=None, step=0):
        dt = t - state["t_prev"]
        use_phi = self.com_method == "bound_phi" and phi is not None

        def predictor(_):
            a = state["a_df"]
            com = (state["r_com"] + state["v_com"] * dt
                   + 0.5 * a * dt * dt)
            v_com = state["v_com"] + a * dt
            if use_phi:
                return (com, v_com, state["r_sphere"], state["m_bound"],
                        state["bound"])
            return com, v_com, state["r_sphere"]

        if use_phi:
            def full_update(_):
                com, v_com, bound, m_b = bound_center_phi(
                    pos, vel, mass, phi, state["r_com"], state["v_com"],
                    dt, r_max=self.bound_r_max)
                return com, v_com, state["r_sphere"], m_b, bound

            refresh = (jnp.asarray(step) % self.update_interval) == 0
            r_com, v_com, r_sph, m_bound, bound = lax.cond(
                refresh, full_update, predictor, None)
            # dynamic satellite mass tracks tidal stripping; floor at a
            # small fraction of the initial satellite mass so a fully
            # stripped remnant decays the friction smoothly to ~zero
            # instead of hitting an arbitrary unit-dependent constant
            # (r1 review: the old floor was a hardcoded 1e4 Msun)
            m_eff = jnp.maximum(m_bound, 1e-4 * self.M_sat)
        else:
            def full_update(_):
                com, v_com, r_sph = shrinking_sphere_com(
                    pos, vel, mass, self.shrink_n_iter, self.shrink_frac)
                return com, v_com, r_sph

            refresh = (jnp.asarray(step) % self.update_interval) == 0
            r_com, v_com, r_sph = lax.cond(refresh, full_update,
                                           predictor, None)
            m_eff = self.M_sat

        r = jnp.linalg.norm(r_com)
        rho = self.pot.density(r_com, t=t)
        sig = self.sigma(r, t=t)
        a_df = chandrasekhar_accel(
            r_com, v_com, m_eff, rho, sig, t, G=self.G,
            coulomb_mode=self.coulomb_mode,
            fixed_ln_lambda=self.fixed_ln_lambda,
            core_gamma=self.core_gamma, r_core=self.r_core,
        ).astype(pos.dtype)

        if use_phi:
            # phi path: DF applies to the bound particles
            acc = jnp.where(bound[:, None], a_df[None, :], 0.0)
        elif self.apply_radius_factor is not None:
            cutoff = self.apply_radius_factor * r_sph
            d = jnp.linalg.norm(pos - r_com, axis=1)
            acc = jnp.where((d <= cutoff)[:, None], a_df[None, :], 0.0)
        else:
            acc = jnp.broadcast_to(a_df, pos.shape)

        new_state = {
            "r_com": r_com,
            "v_com": v_com,
            "r_sphere": r_sph,
            "a_df": a_df,
            "t_prev": jnp.asarray(t, pos.dtype),
        }
        if self.com_method == "bound_phi":
            new_state["m_bound"] = (m_bound if use_phi
                                    else state["m_bound"])
            new_state["bound"] = bound if use_phi else state["bound"]
        return acc, new_state


def make_df_force_extra(pot, M_sat: float, **kwargs) -> ChandrasekharFriction:
    """Factory matching the reference surface (reference:
    _chandrasekhar.py:528): returns a jittable ForceExtra applying
    Chandrasekhar friction to the satellite CoM motion."""
    return ChandrasekharFriction(pot, M_sat, **kwargs)
