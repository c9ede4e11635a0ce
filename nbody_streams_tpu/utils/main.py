"""Analysis utilities: profiles, fits, shapes, centering, unbinding.

Reference-equivalent surface (reference: utils/main.py:107-2047) built on
NumPy for the host-side statistics and on the framework's own potential
solvers for the energy-based pieces (unbinding runs the Pallas direct
kernel on TPU; the reference shells out to falcON / CUDA tree / Agama).
"""
from __future__ import annotations

import numpy as np

from ..constants import G_DEFAULT

__all__ = [
    "make_uneven_grid",
    "empirical_density_profile",
    "empirical_circular_velocity_profile",
    "empirical_velocity_dispersion_profile",
    "empirical_velocity_rms_profile",
    "empirical_velocity_anisotropy_profile",
    "double_power_law_density",
    "fit_double_spheroid_profile",
    "fit_dehnen_profile",
    "fit_plummer_profile",
    "fit_iterative_ellipsoid",
    "uniform_spherical_grid",
    "fibonacci_sphere_grid",
    "find_center",
    "find_center_position",
    "iterative_unbinding",
    "compute_iterative_boundness",
]


# ---------------------------------------------------------------------------
# Grids
# ---------------------------------------------------------------------------

def make_uneven_grid(r_min: float, r_max: float, n: int = 40,
                     power: float = 1.0) -> np.ndarray:
    """Quasi-logarithmic radial grid (power=1 -> pure log spacing)."""
    lg = np.linspace(np.log(r_min), np.log(r_max), n)
    if power != 1.0:
        u = (lg - lg[0]) / (lg[-1] - lg[0])
        lg = lg[0] + (lg[-1] - lg[0]) * u**power
    return np.exp(lg)


def uniform_spherical_grid(n_r: int = 16, n_points: int = 200,
                           r_min: float = 0.1, r_max: float = 100.0):
    """(N, 3) points on log-spaced shells with Fibonacci coverage."""
    radii = np.geomspace(r_min, r_max, n_r)
    shells = [r * fibonacci_sphere_grid(n_points) for r in radii]
    return np.concatenate(shells), radii


def fibonacci_sphere_grid(n: int = 200) -> np.ndarray:
    """(n, 3) near-uniform unit vectors via the golden-angle spiral."""
    i = np.arange(n) + 0.5
    phi = np.pi * (1.0 + np.sqrt(5.0)) * i
    cos_t = 1.0 - 2.0 * i / n
    sin_t = np.sqrt(1.0 - cos_t**2)
    return np.column_stack([sin_t * np.cos(phi), sin_t * np.sin(phi),
                            cos_t])


# ---------------------------------------------------------------------------
# Radial profiles
# ---------------------------------------------------------------------------

def _radial_bins(r, bins, r_min=None, r_max=None):
    if np.isscalar(bins):
        r_min = r_min or max(np.percentile(r, 0.2), 1e-6)
        r_max = r_max or np.percentile(r, 99.5)
        edges = np.geomspace(r_min, r_max, int(bins) + 1)
    else:
        edges = np.asarray(bins, float)
    mids = np.sqrt(edges[:-1] * edges[1:])
    idx = np.digitize(r, edges) - 1
    valid = (idx >= 0) & (idx < len(mids))
    return edges, mids, idx, valid


def empirical_density_profile(pos, mass, center=None, bins=30,
                              r_min=None, r_max=None):
    """(r_mid, rho(r), counts) spherical mass-density profile."""
    pos = np.asarray(pos, float)
    mass = np.broadcast_to(np.asarray(mass, float), (pos.shape[0],))
    if center is not None:
        pos = pos - np.asarray(center)
    r = np.linalg.norm(pos, axis=1)
    edges, mids, idx, valid = _radial_bins(r, bins, r_min, r_max)
    msum = np.bincount(idx[valid], weights=mass[valid],
                       minlength=len(mids))
    counts = np.bincount(idx[valid], minlength=len(mids))
    vol = 4.0 / 3.0 * np.pi * (edges[1:]**3 - edges[:-1]**3)
    return mids, msum / vol, counts


def empirical_circular_velocity_profile(pos, mass, center=None, bins=30,
                                        G: float = G_DEFAULT,
                                        r_min=None, r_max=None):
    """(r_mid, v_circ = sqrt(G M(<r)/r)) from enclosed mass."""
    pos = np.asarray(pos, float)
    mass = np.broadcast_to(np.asarray(mass, float), (pos.shape[0],))
    if center is not None:
        pos = pos - np.asarray(center)
    r = np.linalg.norm(pos, axis=1)
    edges, mids, _, _ = _radial_bins(r, bins, r_min, r_max)
    order = np.argsort(r)
    m_enc_sorted = np.cumsum(mass[order])
    m_at = np.interp(mids, r[order], m_enc_sorted)
    return mids, np.sqrt(G * m_at / mids)


def _velocity_profile(pos, vel, center, center_v, bins, stat,
                      r_min=None, r_max=None):
    pos = np.asarray(pos, float)
    vel = np.asarray(vel, float)
    if center is not None:
        pos = pos - np.asarray(center)
    if center_v is not None:
        vel = vel - np.asarray(center_v)
    r = np.linalg.norm(pos, axis=1)
    edges, mids, idx, valid = _radial_bins(r, bins, r_min, r_max)
    out = np.full(len(mids), np.nan)
    for k in range(len(mids)):
        sel = valid & (idx == k)
        if sel.sum() > 1:
            out[k] = stat(pos[sel], vel[sel], r[sel])
    return mids, out


def empirical_velocity_dispersion_profile(pos, vel, center=None,
                                          center_v=None, bins=30,
                                          **kw):
    """(r_mid, sigma_r) radial velocity dispersion."""
    def stat(p, v, r):
        vr = np.sum(p * v, axis=1) / np.maximum(r, 1e-12)
        return np.std(vr)

    return _velocity_profile(pos, vel, center, center_v, bins, stat, **kw)


def empirical_velocity_rms_profile(pos, vel, center=None, center_v=None,
                                   bins=30, **kw):
    """(r_mid, v_rms) total rms speed profile."""
    def stat(p, v, r):
        return np.sqrt(np.mean((v**2).sum(1)))

    return _velocity_profile(pos, vel, center, center_v, bins, stat, **kw)


def empirical_velocity_anisotropy_profile(pos, vel, center=None,
                                          center_v=None, bins=30, **kw):
    """(r_mid, beta = 1 - sigma_t^2/(2 sigma_r^2))."""
    def stat(p, v, r):
        rr = np.maximum(r, 1e-12)[:, None]
        rhat = p / rr
        # spherical basis: theta-hat, phi-hat
        rho_c = np.sqrt(p[:, 0]**2 + p[:, 1]**2) + 1e-30
        phihat = np.column_stack([-p[:, 1] / rho_c, p[:, 0] / rho_c,
                                  np.zeros(len(p))])
        thetahat = np.cross(phihat, rhat)
        vr = np.sum(rhat * v, axis=1)
        vth = np.sum(thetahat * v, axis=1)
        vph = np.sum(phihat * v, axis=1)
        s_r2 = np.var(vr)
        s_t2 = np.var(vth) + np.var(vph)
        return 1.0 - s_t2 / np.maximum(2.0 * s_r2, 1e-12)

    return _velocity_profile(pos, vel, center, center_v, bins, stat, **kw)


# ---------------------------------------------------------------------------
# Profile fits
# ---------------------------------------------------------------------------

def double_power_law_density(r, rho_s, r_s, alpha, beta, gamma):
    """Zhao (1996) alpha-beta-gamma profile:
    rho = rho_s (r/r_s)^-gamma [1 + (r/r_s)^alpha]^-((beta-gamma)/alpha).
    """
    x = np.asarray(r, float) / r_s
    return rho_s * x**(-gamma) * (1.0 + x**alpha)**(-(beta - gamma) / alpha)


def _fit_log_profile(model, r, rho, p0, bounds):
    from scipy.optimize import curve_fit

    good = (rho > 0) & np.isfinite(rho)
    popt, pcov = curve_fit(model, r[good], np.log(rho[good]), p0=p0,
                           bounds=bounds, maxfev=20000)
    return popt, np.sqrt(np.diag(pcov))


def fit_double_spheroid_profile(r, rho, p0=None):
    """Fit the alpha-beta-gamma profile to a density curve; returns
    (params dict, 1-sigma errors dict)."""
    r = np.asarray(r, float)
    rho = np.asarray(rho, float)
    if p0 is None:
        p0 = [np.interp(np.median(r), r, rho), np.median(r), 1.0, 3.0, 1.0]

    def model(rr, lrho_s, lr_s, alpha, beta, gamma):
        return np.log(double_power_law_density(
            rr, np.exp(lrho_s), np.exp(lr_s), alpha, beta, gamma))

    p0l = [np.log(max(p0[0], 1e-300)), np.log(p0[1]), p0[2], p0[3], p0[4]]
    bounds = ([-200, np.log(r.min() / 10), 0.2, 1.0, 0.0],
              [200, np.log(r.max() * 10), 5.0, 8.0, 2.8])
    popt, perr = _fit_log_profile(model, r, rho, p0l, bounds)
    names = ["rho_s", "r_s", "alpha", "beta", "gamma"]
    vals = [np.exp(popt[0]), np.exp(popt[1]), *popt[2:]]
    errs = [vals[0] * perr[0], vals[1] * perr[1], *perr[2:]]
    return dict(zip(names, vals)), dict(zip(names, errs))


def fit_dehnen_profile(r, rho, p0=None):
    """Fit a Dehnen (1993) profile rho = (3-g) M a / (4 pi r^g (r+a)^(4-g));
    returns ({'mass','scaleRadius','gamma'}, errors)."""
    r = np.asarray(r, float)
    rho = np.asarray(rho, float)

    def model(rr, logm, loga, gamma):
        m, a = np.exp(logm), np.exp(loga)
        return np.log((3.0 - gamma) * m * a
                      / (4.0 * np.pi * rr**gamma * (rr + a)**(4.0 - gamma)))

    if p0 is None:
        p0 = [np.log(4 * np.pi * np.trapezoid(rho * r**2, r)),
              np.log(np.median(r)), 1.0]
    bounds = ([-200, np.log(r.min() / 10), 0.0],
              [200, np.log(r.max() * 10), 2.8])
    popt, perr = _fit_log_profile(model, r, rho, p0, bounds)
    vals = dict(mass=np.exp(popt[0]), scaleRadius=np.exp(popt[1]),
                gamma=popt[2])
    errs = dict(mass=vals["mass"] * perr[0],
                scaleRadius=vals["scaleRadius"] * perr[1], gamma=perr[2])
    return vals, errs


def fit_plummer_profile(r, rho, p0=None):
    """Fit a Plummer sphere; returns ({'mass','scaleRadius'}, errors)."""
    r = np.asarray(r, float)
    rho = np.asarray(rho, float)

    def model(rr, logm, logb):
        m, b = np.exp(logm), np.exp(logb)
        return np.log(3.0 * m / (4.0 * np.pi * b**3)
                      * (1.0 + (rr / b)**2)**-2.5)

    if p0 is None:
        p0 = [np.log(4 * np.pi * np.trapezoid(rho * r**2, r)),
              np.log(np.median(r))]
    bounds = ([-200, np.log(r.min() / 10)], [200, np.log(r.max() * 10)])
    popt, perr = _fit_log_profile(model, r, rho, p0, bounds)
    vals = dict(mass=np.exp(popt[0]), scaleRadius=np.exp(popt[1]))
    errs = dict(mass=vals["mass"] * perr[0],
                scaleRadius=vals["scaleRadius"] * perr[1])
    return vals, errs


# ---------------------------------------------------------------------------
# Shape
# ---------------------------------------------------------------------------

def fit_iterative_ellipsoid(pos, mass=None, center=None, r_max=None,
                            n_iter: int = 20, tol: float = 1e-4,
                            reduced: bool = True):
    """Iterative ellipsoidal shape fit via the (reduced) inertia tensor.

    Returns dict with axis ratios b/a, c/a, the rotation matrix (rows =
    principal axes, descending), and convergence info (reference:
    utils/main.py:1025-1326).
    """
    pos = np.asarray(pos, float)
    n = pos.shape[0]
    w = (np.ones(n) if mass is None
         else np.broadcast_to(np.asarray(mass, float), (n,)).copy())
    if center is not None:
        pos = pos - np.asarray(center)
    if r_max is None:
        r_max = np.percentile(np.linalg.norm(pos, axis=1), 90)

    axes = np.eye(3)
    q = s = 1.0
    converged = False
    it = -1   # n_iter=0: report 0 iterations, identity result
    for it in range(n_iter):
        y = pos @ axes.T
        r_ell2 = y[:, 0]**2 + (y[:, 1] / q)**2 + (y[:, 2] / s)**2
        sel = r_ell2 <= r_max**2
        if sel.sum() < 10:
            break
        ww = w[sel]
        if reduced:
            ww = ww / np.maximum(r_ell2[sel], 1e-12)
        x = pos[sel]
        # matmul form: same 3x3 inertia tensor without the (N, 3, 3)
        # temporary (~720 MB/iteration at N = 1e7)
        tensor = (x * ww[:, None]).T @ x
        tensor /= ww.sum()
        evals, evecs = np.linalg.eigh(tensor)
        order = np.argsort(evals)[::-1]
        evals = evals[order]
        axes_new = evecs[:, order].T
        q_new = np.sqrt(evals[1] / evals[0])
        s_new = np.sqrt(evals[2] / evals[0])
        if abs(q_new - q) < tol and abs(s_new - s) < tol:
            q, s, axes = q_new, s_new, axes_new
            converged = True
            break
        q, s, axes = q_new, s_new, axes_new
    return {"b_over_a": q, "c_over_a": s, "axes": axes,
            "converged": converged, "iterations": it + 1}


# ---------------------------------------------------------------------------
# Centering
# ---------------------------------------------------------------------------

def _shrinking_sphere(pos, mass, n_iter=12, frac=0.7, min_particles=50):
    com = (pos * mass[:, None]).sum(0) / mass.sum()
    r = np.linalg.norm(pos - com, axis=1).max()
    for _ in range(n_iter):
        r *= frac
        d = np.linalg.norm(pos - com, axis=1)
        sel = d <= r
        if sel.sum() < min_particles:
            break
        com = (pos[sel] * mass[sel, None]).sum(0) / mass[sel].sum()
    return com


def find_center(pos, vel=None, mass=None, method: str = "density_peak",
                potential_solver=None, vel_aperture: float | None = None,
                G: float = G_DEFAULT, **solver_kwargs):
    """Locate the density/potential centre of a particle set.

    method='density_peak': centre of the 1% most-bound particles by
    self-potential (solver from :func:`iterative_unbinding`'s menu);
    method='shrinking_sphere': geometric shrinking sphere.
    Returns centre (3,), or (centre, v_centre) when ``vel`` is given
    (v from particles within ``vel_aperture`` of the centre).
    (reference: utils/main.py:1460-1713)
    """
    pos = np.asarray(pos, float)
    n = pos.shape[0]
    mass_arr = (np.ones(n) if mass is None
                else np.broadcast_to(np.asarray(mass, float), (n,)))

    if method == "shrinking_sphere":
        center = _shrinking_sphere(pos, mass_arr)
    elif method == "density_peak":
        phi = _self_potential(pos, mass_arr,
                              solver=potential_solver or "direct",
                              G=G, **solver_kwargs)
        k = max(1, n // 100)
        sel = np.argpartition(phi, k)[:k]
        center = (pos[sel] * mass_arr[sel, None]).sum(0) \
            / mass_arr[sel].sum()
    else:
        raise ValueError(f"unknown centering method {method!r}")

    if vel is None:
        return center
    vel = np.asarray(vel, float)
    d = np.linalg.norm(pos - center, axis=1)
    ap = np.percentile(d, 10) if vel_aperture is None else vel_aperture
    sel = d <= ap
    if not sel.any():
        raise ValueError(
            f"vel_aperture={ap:g} selects no particles around the centre "
            f"(nearest particle at distance {d.min():g}); enlarge it or "
            "pass vel_aperture=None for the 10th-percentile default")
    v_center = (vel[sel] * mass_arr[sel, None]).sum(0) / mass_arr[sel].sum()
    return center, v_center


def find_center_position(*args, **kwargs):
    """Position-only alias (reference deprecated alias, main.py:1692)."""
    out = find_center(*args, **kwargs)
    return out[0] if isinstance(out, tuple) else out


# ---------------------------------------------------------------------------
# Unbinding
# ---------------------------------------------------------------------------

def _self_potential(pos, mass, solver: str = "direct", G: float = G_DEFAULT,
                    softening=0.0, kernel: str = "plummer",
                    precision: str = "float32_kahan", r_grid_n: int = 64):
    """Per-particle self-potential via a pluggable solver.

    'direct' (alias 'direct_gpu', 'tree', 'tree_gpu'): exact O(N^2)
    summation through the framework's kernels (Pallas on TPU);
    'bfe': spherical shell approximation (O(N log N)).
    """
    key = solver.lower()
    if key in ("direct", "direct_gpu", "direct_tpu", "tree", "tree_gpu"):
        from ..ops import compute_potential_direct

        return np.asarray(compute_potential_direct(
            pos, mass, softening, G=G, kernel=kernel, precision=precision))
    if key == "bfe":
        from ..fast_sims import spherical_potential_from_particles

        # the refit profile is origin-centred: evaluate relative to the
        # cluster's centre of mass
        com = (pos * mass[:, None]).sum(0) / mass.sum()
        pot = spherical_potential_from_particles(pos, mass, center=com,
                                                 n_grid=r_grid_n, G=G)
        return np.asarray(pot.potential(pos - com))
    raise ValueError(f"unknown potential solver {solver!r}")


_REF_UNBIND_KWARGS = frozenset((
    "pos_star", "vel_star", "mass_star", "center_position",
    "recursive_iter_converg", "potential_compute_method", "center_on",
    "vel_aperture", "tol_frac_change", "return_history", "top_fraction",
    "theta", "lmax"))


def iterative_unbinding(pos, vel, mass, solver: str = "direct",
                        max_iter: int = 20, G: float = G_DEFAULT,
                        softening=0.0, center_velocity: bool = True,
                        verbose: bool = False, **solver_kwargs):
    """Iteratively remove unbound particles (E = phi + v^2/2 > 0).

    Returns (bound_mask (N,), info dict).  Velocities are measured
    relative to the bound subset's mass-weighted mean each iteration
    (reference: utils/main.py:1722-2047).

    The reference call form is also accepted (detected by its
    reference-only kwargs: ``pos_star``/``potential_compute_method``/
    ``center_position``/``tol_frac_change``/... or a vector
    ``center_velocity``) and returns the reference contract
    ``((bound_dark[, bound_star][, histories...]), center_position,
    center_velocity)`` with int masks — see
    :func:`compute_iterative_boundness`.
    """
    if (not isinstance(center_velocity, bool)
            or _REF_UNBIND_KWARGS & solver_kwargs.keys()):
        ref_kwargs = dict(solver_kwargs)
        if not isinstance(center_velocity, bool):
            ref_kwargs["center_velocity"] = center_velocity
        if solver != "direct":
            ref_kwargs.setdefault("potential_compute_method", solver)
        ref_kwargs.setdefault("recursive_iter_converg", max_iter
                              if max_iter != 20 else 50)
        return _unbinding_reference_form(
            pos, vel, mass, softening=softening, G=G, verbose=verbose,
            **ref_kwargs)
    pos = np.asarray(pos, float)
    vel = np.asarray(vel, float)
    n = pos.shape[0]
    mass = np.broadcast_to(np.asarray(mass, float), (n,)).copy()

    bound = np.ones(n, dtype=bool)
    history = []
    for it in range(max_iter):
        nb = int(bound.sum())
        if nb < 2:
            break
        phi = np.full(n, np.inf)
        phi_b = _self_potential(pos[bound], mass[bound], solver=solver,
                                G=G, softening=softening, **solver_kwargs)
        phi[bound] = phi_b
        if center_velocity:
            v0 = (vel[bound] * mass[bound, None]).sum(0) / mass[bound].sum()
        else:
            v0 = np.zeros(3)
        ke = 0.5 * ((vel - v0) ** 2).sum(1)
        new_bound = (phi + ke) < 0.0
        n_removed = int((bound & ~new_bound).sum())
        history.append(n_removed)
        if verbose:
            print(f"  unbinding iter {it}: removed {n_removed}, "
                  f"bound {int(new_bound.sum())}/{n}")
        if n_removed == 0:
            bound = new_bound
            break
        bound = new_bound
    return bound, {
        "iterations": len(history),
        "removed_per_iter": history,
        "bound_fraction": float(bound.sum()) / n,
    }


def _unbinding_reference_form(
        pos_dark, vel_dark, mass_dark, pos_star=None, vel_star=None,
        mass_star=None, center_position=(), center_velocity=(),
        recursive_iter_converg: int = 50,
        potential_compute_method: str = "tree", softening: float = 0.03,
        G: float = G_DEFAULT, center_on: str = "dark",
        vel_aperture: float = 5.0, tol_frac_change: float = 1e-4,
        verbose: bool = True, return_history: bool = False, **kwargs):
    """Reference-contract unbinding (reference utils/main.py:1722-2047).

    Multi-component (dark + star), automatic density-peak centering
    (mass-weighted centroid of the lowest-phi ``top_fraction`` of
    ``center_on`` particles; velocity = aperture mean), fixed centre,
    iterate ``E = phi + |v_rel|^2/2 < 0`` until the changed fraction
    drops below ``tol_frac_change``.  Solvers: 'tree'/'tree_gpu'/
    'direct'/'direct_gpu' all run the exact direct sum (Pallas on TPU —
    force error 0 instead of the tree's 1-5%; ``theta`` accepted and
    ignored); 'bfe' fits a native Multipole (``lmax``, default 8) on the
    bound subset each iteration.  Returns ``((bound_dark[, bound_star]
    [, history_dark][, history_star]), center_position,
    center_velocity)`` with int masks, exactly the reference contract.
    """
    from ..ops import compute_potential_direct

    method = potential_compute_method.lower()
    if method not in ("tree", "tree_gpu", "direct", "direct_gpu",
                      "direct_tpu", "bfe"):
        raise ValueError(
            f"unknown potential_compute_method {potential_compute_method!r}")
    lmax = int(kwargs.pop("lmax", 8))
    top_fraction = float(kwargs.pop("top_fraction", 0.01))
    kwargs.pop("theta", None)             # tree opening angle: exact here
    precision = kwargs.pop("precision", "float32_kahan")
    kernel = kwargs.pop("kernel", "plummer")
    if kwargs:
        raise TypeError(f"unexpected kwargs: {sorted(kwargs)}")

    pos_dark = np.asarray(pos_dark, float)
    vel_dark = np.asarray(vel_dark, float)
    n_dark = pos_dark.shape[0]
    mass_dark = np.broadcast_to(np.asarray(mass_dark, float),
                                (n_dark,)).copy()
    has_stars = pos_star is not None
    if has_stars:
        pos_star = np.asarray(pos_star, float)
        vel_star = np.asarray(vel_star, float)
        mass_star = np.broadcast_to(np.asarray(mass_star, float),
                                    (pos_star.shape[0],)).copy()
        pos_all = np.vstack((pos_dark, pos_star))
        vel_all = np.vstack((vel_dark, vel_star))
        mass_all = np.concatenate((mass_dark, mass_star))
    else:
        pos_all, vel_all, mass_all = pos_dark, vel_dark, mass_dark
    if center_on == "star" and not has_stars:
        raise ValueError("center_on='star' requires star data")
    if center_on == "both" or not has_stars:
        ctr_sl = slice(None)
    elif center_on == "star":
        ctr_sl = slice(n_dark, None)
    else:
        ctr_sl = slice(None, n_dark)

    def phi_of(pos_eval, mass_src, bound_mask):
        if method == "bfe":
            from ..potentials import fit_multipole_from_particles
            from ..potentials.multipole import MultipolePotential

            coefs = fit_multipole_from_particles(
                pos_eval[bound_mask], mass_src[bound_mask], lmax=lmax,
                G=G)
            return np.asarray(MultipolePotential(coefs)
                              .potential(pos_eval))
        # exact direct sum; unbound sources masked to zero mass (they
        # still receive phi at their positions and can re-bind)
        return np.asarray(compute_potential_direct(
            pos_eval, mass_src * bound_mask, softening, G=G,
            kernel=kernel, precision=precision))

    center_position = np.asarray(center_position, float)
    center_velocity = np.asarray(center_velocity, float)
    all_bound = np.ones(len(pos_all), dtype=bool)
    if center_position.size < 3:
        phi_init = phi_of(pos_all, mass_all, all_bound)
        phi_c, pos_c, m_c = (phi_init[ctr_sl], pos_all[ctr_sl],
                             mass_all[ctr_sl])
        n_pick = max(10, int(len(phi_c) * top_fraction))
        idx = np.argsort(phi_c)[:n_pick]
        center_position = np.average(pos_c[idx], axis=0,
                                     weights=m_c[idx])
    if center_velocity.size < 3:
        pos_c, vel_c, m_c = (pos_all[ctr_sl], vel_all[ctr_sl],
                             mass_all[ctr_sl])
        sel = np.sum((pos_c - center_position) ** 2, axis=1) \
            < vel_aperture ** 2
        if not sel.any():
            sel = np.ones(len(pos_c), dtype=bool)
        center_velocity = np.average(vel_c[sel], axis=0,
                                     weights=m_c[sel])
    if verbose:
        print(f"unbinding centre: pos {np.around(center_position, 2)} "
              f"vel {np.around(center_velocity, 2)}")

    pos_rel = pos_all - center_position
    vel_rel = vel_all - center_velocity
    kin = 0.5 * np.sum(vel_rel ** 2, axis=1)
    mask = np.ones(len(pos_all), dtype=bool)
    hist_dark, hist_star = [], []
    for i in range(recursive_iter_converg):
        if int(mask.sum()) < 5:
            break
        phi = phi_of(pos_rel, mass_all, mask)
        new = (phi + kin) < 0.0
        hist_dark.append(new[:n_dark].copy())
        if has_stars:
            hist_star.append(new[n_dark:].copy())
        frac = float(np.mean(new != mask))
        if verbose:
            print(f"  unbinding iter {i}: delta bound mask = {frac:.5f}")
        mask = new
        if frac < tol_frac_change:
            break

    results = [mask[:n_dark].astype(int)]
    if has_stars:
        results.append(mask[n_dark:].astype(int))
    if return_history:
        results.append(hist_dark)
        if has_stars:
            results.append(hist_star)
    return tuple(results), center_position, center_velocity


def compute_iterative_boundness(*args, **kwargs):
    """Deprecated reference alias (reference utils/main.py:1714-1720):
    always runs the reference-contract form."""
    import warnings

    warnings.warn(
        "compute_iterative_boundness is deprecated; use "
        "iterative_unbinding.", DeprecationWarning, stacklevel=2)
    return _unbinding_reference_form(*args, **kwargs)
