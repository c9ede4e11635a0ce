"""External-potential stack: analytic forms, autodiff consistency,
modifiers, BFE evaluators (Multipole / CylSpline), factory/INI, archives.

Mirrors the reference's agama_helper phase-1/2/3 accuracy ladders
(reference: agama_helper/tests/) with analytic ground truth instead of
Agama.
"""
from pathlib import Path

import numpy as np
import pytest

from nbody_streams_tpu.constants import G_DEFAULT
from nbody_streams_tpu.potentials import (
    AnalyticPotential,
    CylSplinePotential,
    CylSplineCoefs,
    EvolvingPotential,
    HernquistPotential,
    MiyamotoNagaiPotential,
    MultipoleCoefs,
    MultipolePotential,
    NFWPotential,
    PlummerPotential,
    ScaledPotential,
    ShiftedPotential,
    load_evolving_potential,
    load_potential,
    make_potential,
    read_coef_string,
    read_mult_coefs,
    write_coef_to_h5,
    write_snapshot_coefs_to_h5,
)

DATA = Path(__file__).resolve().parent.parent / "nbody_streams_tpu/data"


@pytest.fixture
def pts(rng):
    return rng.normal(0.0, 20.0, (200, 3))


# ---------------------------------------------------------------------------
# Analytic potentials
# ---------------------------------------------------------------------------

def test_plummer_closed_form(pts):
    p = PlummerPotential(mass=1e11, scaleRadius=5.0)
    r2 = (pts**2).sum(1)
    phi_exp = -G_DEFAULT * 1e11 / np.sqrt(r2 + 25.0)
    np.testing.assert_allclose(np.asarray(p.potential(pts)), phi_exp,
                               rtol=1e-12)
    # force = -grad phi: closed form GM x / (r^2+b^2)^{3/2}
    f_exp = -G_DEFAULT * 1e11 * pts / (r2 + 25.0)[:, None] ** 1.5
    np.testing.assert_allclose(np.asarray(p.force(pts)), f_exp, rtol=1e-10)


def test_nfw_closed_form(pts):
    p = NFWPotential(mass=1e12, scaleRadius=20.0)
    r = np.sqrt((pts**2).sum(1))
    phi_exp = -G_DEFAULT * 1e12 * np.log1p(r / 20.0) / r
    np.testing.assert_allclose(np.asarray(p.potential(pts)), phi_exp,
                               rtol=1e-10)


def test_density_from_laplacian(pts):
    """Autodiff density must match the analytic Hernquist profile."""
    p = HernquistPotential(mass=1e11, scaleRadius=4.0)
    r = np.sqrt((pts**2).sum(1))
    rho_exp = 1e11 * 4.0 / (2 * np.pi * r * (r + 4.0) ** 3)
    rho = np.asarray(p.density(pts))
    np.testing.assert_allclose(rho, rho_exp, rtol=1e-6)


def test_force_deriv_layout(pts):
    """forceDeriv returns (force, -hess6[xx,yy,zz,xy,yz,xz])."""
    p = PlummerPotential(mass=1e11, scaleRadius=5.0)
    f, d = p.forceDeriv(pts[:5])
    assert f.shape == (5, 3) and d.shape == (5, 6)
    # trace of -hess = -4 pi G rho
    rho = np.asarray(p.density(pts[:5]))
    np.testing.assert_allclose(-(d[:, 0] + d[:, 1] + d[:, 2]),
                               4 * np.pi * G_DEFAULT * rho, rtol=1e-6)


def test_eval_combinations(pts):
    p = MiyamotoNagaiPotential(mass=5e10, scaleRadius=3.0, scaleHeight=0.3)
    phi = p.eval(pts[:4], pot=True)
    phi2, acc = p.eval(pts[:4], pot=True, acc=True)
    np.testing.assert_allclose(np.asarray(phi), np.asarray(phi2))
    assert np.asarray(acc).shape == (4, 3)
    with pytest.raises(ValueError):
        p.eval(pts[:4])


def test_composition(pts):
    a = PlummerPotential(mass=1e10, scaleRadius=1.0)
    b = NFWPotential(mass=1e12, scaleRadius=20.0)
    c = a + b
    np.testing.assert_allclose(
        np.asarray(c.potential(pts)),
        np.asarray(a.potential(pts)) + np.asarray(b.potential(pts)),
        rtol=1e-12,
    )
    s = sum([a, b, a])
    assert len(s) == 3


def test_analytic_factory():
    p = AnalyticPotential(type="NFW", mass=1e12, scaleRadius=20.0)
    assert isinstance(p, NFWPotential)
    with pytest.raises(ValueError):
        AnalyticPotential(type="nope")


# ---------------------------------------------------------------------------
# Modifiers
# ---------------------------------------------------------------------------

def test_shifted_static(pts):
    inner = PlummerPotential(mass=1e11, scaleRadius=5.0)
    c = np.array([10.0, -5.0, 3.0])
    p = ShiftedPotential(inner, c)
    np.testing.assert_allclose(np.asarray(p.potential(pts)),
                               np.asarray(inner.potential(pts - c)),
                               rtol=1e-12)


def test_shifted_trajectory(pts):
    inner = PlummerPotential(mass=1e11, scaleRadius=5.0)
    t = np.linspace(0.0, 1.0, 11)
    traj = np.column_stack([t, 10 * t, 0 * t, 0 * t])   # moves along +x
    p = ShiftedPotential(inner, traj)
    assert p.time_dependent
    np.testing.assert_allclose(
        np.asarray(p.potential(pts, t=0.5)),
        np.asarray(inner.potential(pts - np.array([5.0, 0, 0]))),
        rtol=1e-6,
    )
    # clamped outside range
    np.testing.assert_allclose(
        np.asarray(p.potential(pts, t=99.0)),
        np.asarray(inner.potential(pts - np.array([10.0, 0, 0]))),
        rtol=1e-6,
    )


def test_scaled_semantics(pts):
    """Phi_s = a s Phi(x s), force scales as a s^2 (Agama convention)."""
    inner = PlummerPotential(mass=1e11, scaleRadius=5.0)
    p = ScaledPotential(inner, scale=2.0, ampl=3.0)
    s = 0.5
    np.testing.assert_allclose(
        np.asarray(p.potential(pts)),
        3.0 * s * np.asarray(inner.potential(pts * s)),
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(p.force(pts)),
        3.0 * s * s * np.asarray(inner.force(pts * s)),
        rtol=1e-10,
    )


def test_evolving_lerp(pts):
    a = PlummerPotential(mass=1e11, scaleRadius=5.0)
    b = PlummerPotential(mass=2e11, scaleRadius=5.0)
    ev = EvolvingPotential([a, b], [0.0, 1.0])
    mid = np.asarray(ev.potential(pts, t=0.25))
    exp = 0.75 * np.asarray(a.potential(pts)) \
        + 0.25 * np.asarray(b.potential(pts))
    np.testing.assert_allclose(mid, exp, rtol=1e-7)
    # clamped
    np.testing.assert_allclose(np.asarray(ev.potential(pts, t=-5.0)),
                               np.asarray(a.potential(pts)), rtol=1e-7)
    # nearest mode
    evn = EvolvingPotential([a, b], [0.0, 1.0], interpolate=False)
    np.testing.assert_allclose(np.asarray(evn.potential(pts, t=0.1)),
                               np.asarray(a.potential(pts)), rtol=1e-7)


# ---------------------------------------------------------------------------
# Multipole BFE
# ---------------------------------------------------------------------------

def make_spherical_coefs(pot, r_grid):
    pts_r = np.column_stack([r_grid, 0 * r_grid, 0 * r_grid])
    phi = np.asarray(pot.potential(pts_r))
    dphi = -np.asarray(pot.force(pts_r))[:, 0]
    return MultipoleCoefs(R_grid=r_grid, lm_labels=[(0, 0)],
                          phi=phi[:, None], dphi_dr=dphi[:, None])


def test_multipole_spherical_accuracy(pts):
    pl = PlummerPotential(mass=1e11, scaleRadius=5.0)
    mp = MultipolePotential(make_spherical_coefs(pl,
                                                 np.geomspace(0.05, 500, 40)))
    p_ref = np.asarray(pl.potential(pts))
    np.testing.assert_allclose(np.asarray(mp.potential(pts)), p_ref,
                               atol=3e-7 * np.abs(p_ref).max())
    f_ref = np.asarray(pl.force(pts))
    np.testing.assert_allclose(np.asarray(mp.force(pts)), f_ref,
                               atol=1e-5 * np.abs(f_ref).max())


def test_multipole_monopole_invphi0_nfw(pts):
    """NFW monopole through the full Agama invPhi0 (Lambert-W) transform
    (reference: _potential.py:183-331).  Accuracy is grid-limited at
    O(h^4) — the reference's quoted ~1e-12 'floor' is CPU<->GPU
    consistency of the *same* spline, not absolute error; this asserts
    the absolute level of the construction at two grid densities."""
    nfw = NFWPotential(mass=1e12, scaleRadius=20.0)
    for k, tol_p, tol_f in ((40, 2e-8, 3e-7), (160, 1e-10, 3e-9)):
        mp = MultipolePotential(make_spherical_coefs(
            nfw, np.geomspace(0.05, 500, k)))
        p_ref = np.asarray(nfw.potential(pts))
        np.testing.assert_allclose(np.asarray(mp.potential(pts)), p_ref,
                                   atol=tol_p * np.abs(p_ref).max())
        f_ref = np.asarray(nfw.force(pts))
        np.testing.assert_allclose(np.asarray(mp.force(pts)), f_ref,
                                   atol=tol_f * np.abs(f_ref).max())


def test_multipole_hernquist_exact_transform(pts):
    """For Hernquist 1/Phi is linear in r, so the invPhi0 transform is
    exactly representable: the monopole hits machine precision even on
    a coarse grid."""
    from nbody_streams_tpu.potentials.analytic import HernquistPotential

    hq = HernquistPotential(mass=1e12, scaleRadius=20.0)
    mp = MultipolePotential(make_spherical_coefs(
        hq, np.geomspace(0.05, 500, 40)))
    p_ref = np.asarray(hq.potential(pts))
    np.testing.assert_allclose(np.asarray(mp.potential(pts)), p_ref,
                               rtol=1e-11)


def test_multipole_nfw_outer_log_continuation():
    """Beyond the grid an NFW needs the degenerate (W + U ln r)/r form;
    whether the fit lands exactly on it is grid-dependent, but the
    two-term continuation must stay accurate to ~1e-2 at 5x the grid
    edge either way (the 2-node fit cannot see the O(rs/r) correction)."""
    nfw = NFWPotential(mass=1e12, scaleRadius=20.0)
    mp = MultipolePotential(make_spherical_coefs(
        nfw, np.geomspace(0.01, 1000, 40)))
    assert mp._mono is not None and mp._mono[-1] is True  # log form hit
    for grid in (np.geomspace(0.01, 1000, 40),
                 np.geomspace(0.05, 500, 40)):
        mp = MultipolePotential(make_spherical_coefs(nfw, grid))
        r = grid[-1] * np.array([1.5, 3.0, 5.0])
        tp = np.column_stack([r, 0 * r, 0 * r])
        rel = np.abs(np.asarray(mp.potential(tp))
                     / np.asarray(nfw.potential(tp)) - 1)
        assert rel.max() < 1e-2


def test_multipole_projection_flattened(rng):
    """Mildly flattened potential reconstructed from numerical projection."""
    mn = MiyamotoNagaiPotential(mass=5e10, scaleRadius=3.0, scaleHeight=2.0)
    mp = MultipolePotential.from_projection(
        lambda p: np.asarray(mn.potential(p)),
        np.geomspace(0.2, 300.0, 48), lmax=8,
    )
    # axisymmetric + z-symmetric: only even-l m=0 terms survive pruning
    assert all(m == 0 and l % 2 == 0 for l, m in mp.labels)
    pts = rng.normal(0, 15, (200, 3))
    p_ref = np.asarray(mn.potential(pts))
    p_mp = np.asarray(mp.potential(pts))
    assert np.abs(p_mp - p_ref).max() / np.abs(p_ref).max() < 2e-3


def test_multipole_zeroed_filter():
    pl = PlummerPotential(mass=1e11, scaleRadius=5.0)
    coefs = make_spherical_coefs(pl, np.geomspace(0.1, 100, 25))
    z = coefs.zeroed([(0, 0)])
    np.testing.assert_allclose(z.phi, coefs.phi)
    z2 = coefs.zeroed([])
    assert (z2.phi == 0).all()


def test_coef_string_roundtrip():
    pl = PlummerPotential(mass=1e11, scaleRadius=5.0)
    coefs = make_spherical_coefs(pl, np.geomspace(0.1, 100, 25))
    c2 = read_mult_coefs(coefs.to_coef_string())
    np.testing.assert_allclose(c2.phi, coefs.phi)
    np.testing.assert_allclose(c2.dphi_dr, coefs.dphi_dr)
    assert c2.lm_labels == coefs.lm_labels


# ---------------------------------------------------------------------------
# CylSpline BFE
# ---------------------------------------------------------------------------

def make_mn_cylspline():
    mn = MiyamotoNagaiPotential(mass=5e10, scaleRadius=3.0, scaleHeight=0.3)
    r_grid = np.concatenate([[0.0], np.geomspace(0.1, 100.0, 30)])
    zp = np.geomspace(0.05, 100.0, 15)
    z_grid = np.concatenate([-zp[::-1], [0.0], zp])
    rr, zz = np.meshgrid(r_grid, z_grid, indexing="ij")
    pts = np.column_stack([rr.ravel(), np.zeros(rr.size), zz.ravel()])
    tab = np.asarray(mn.potential(pts)).reshape(rr.shape)
    return mn, CylSplineCoefs(R_grid=r_grid, z_grid=z_grid, m_values=[0],
                              phi=tab[None])


def test_cylspline_interior_accuracy(rng):
    mn, coefs = make_mn_cylspline()
    cs = CylSplinePotential(coefs)
    pts = rng.normal(0, 10, (300, 3))
    p_ref = np.asarray(mn.potential(pts))
    assert np.abs(np.asarray(cs.potential(pts)) - p_ref).max() \
        / np.abs(p_ref).max() < 5e-4
    f_ref = np.asarray(mn.force(pts))
    assert np.abs(np.asarray(cs.force(pts)) - f_ref).max() \
        / np.abs(f_ref).max() < 5e-3


def test_cylspline_outer_and_axis():
    mn, coefs = make_mn_cylspline()
    cs = CylSplinePotential(coefs)
    far = np.array([[150.0, 30.0, 10.0], [0.0, 0.0, 140.0]])
    p_ref = np.asarray(mn.potential(far))
    # Miyamoto-Nagai keeps ~3% of its mass outside the R=100 grid
    # (Sigma ~ R^-3 tail) — that genuinely-missing mass, not the fitted
    # continuation, sets this floor (cf. the exponential-disk test
    # below at < 2.5e-3)
    assert np.abs(np.asarray(cs.potential(far)) - p_ref).max() \
        / np.abs(p_ref).max() < 0.02
    # exactly on the z-axis: finite and matching near-axis
    f_axis = np.asarray(cs.force(np.array([0.0, 0.0, 30.0])))
    f_near = np.asarray(cs.force(np.array([1e-7, 0.0, 30.0])))
    assert np.isfinite(f_axis).all()
    np.testing.assert_allclose(f_axis[2], f_near[2], rtol=1e-6)


def test_cylspline_outer_exponential_disk():
    """Outer continuation on a finite-mass disk (negligible mass outside
    the grid): the weighted boundary fit must reach ~1e-3 (VERDICT r1
    item 3; round-1's inscribed-sphere projection was ~5e-2)."""
    from nbody_streams_tpu.potentials.galpot import build_disk

    disk = build_disk(surfaceDensity=8.96e8, scaleRadius=2.5,
                      scaleHeight=0.3)
    r_grid = np.concatenate([[0.0], np.geomspace(0.1, 30.0, 30)])
    zp = np.geomspace(0.05, 6.0, 16)
    z_grid = np.concatenate([-zp[::-1], [0.0], zp])
    rr, zz = np.meshgrid(r_grid, z_grid, indexing="ij")
    pts = np.column_stack([rr.ravel(), np.zeros(rr.size), zz.ravel()])
    tab = np.asarray(disk.potential(pts)).reshape(rr.shape)
    cs = CylSplinePotential(CylSplineCoefs(
        R_grid=r_grid, z_grid=z_grid, m_values=[0], phi=tab[None]))

    far = np.array([[40.0, 0.0, 5.0], [60.0, 0.0, 10.0],
                    [100.0, 0.0, 0.0], [200.0, 0.0, 20.0],
                    [50.0, 0.0, 50.0]])
    rel = np.abs(np.asarray(cs.potential(far))
                 / np.asarray(disk.potential(far)) - 1)
    assert rel.max() < 1e-3
    # polar direction: no far boundary data exists above the caps, the
    # fit extrapolates in angle there — slightly looser
    pole = np.array([[0.0, 0.0, 40.0]])
    rel_pole = abs(float((np.asarray(cs.potential(pole))
                          / np.asarray(disk.potential(pole)))[0]) - 1)
    assert rel_pole < 3e-3
    # buffer region (outside the caps, inside r_enc): intrinsic limit of
    # any origin-centred truncated expansion, same class as Agama
    buf = np.array([[25.0, 0.0, 10.0], [10.0, 0.0, 8.0]])
    rel_buf = np.abs(np.asarray(cs.potential(buf))
                     / np.asarray(disk.potential(buf)) - 1)
    assert rel_buf.max() < 2e-2


# ---------------------------------------------------------------------------
# Factory / INI / archives
# ---------------------------------------------------------------------------

def test_factory_analytic_and_composite(pts):
    p = make_potential(type="NFW", mass=1e12, scaleRadius=20.0)
    assert isinstance(p, NFWPotential)
    c = make_potential({"type": "NFW", "mass": 1e12, "scaleRadius": 20.0},
                       {"type": "Plummer", "mass": 1e10,
                        "scaleRadius": 1.0})
    assert len(c.components) == 2


def test_factory_center_modifier(pts):
    p = make_potential(type="Plummer", mass=1e11, scaleRadius=5.0,
                       center=[10.0, 0.0, 0.0])
    inner = PlummerPotential(mass=1e11, scaleRadius=5.0)
    np.testing.assert_allclose(
        np.asarray(p.potential(pts)),
        np.asarray(inner.potential(pts - np.array([10.0, 0, 0]))),
        rtol=1e-10,
    )


def test_mw_ini_loads(pts):
    p = make_potential(file=str(DATA / "potentials/MWPotential22.ini"))
    assert len(p.components) == 6
    # circular velocity at the solar radius ~ 220-250 km/s
    f = np.asarray(p.force(np.array([8.2, 0.0, 0.0])))
    vc = np.sqrt(-8.2 * f[0])
    assert 200.0 < vc < 260.0


def test_h5_coef_archive_roundtrip(tmp_path):
    pl = PlummerPotential(mass=1e11, scaleRadius=5.0)
    coefs = make_spherical_coefs(pl, np.geomspace(0.1, 100, 25))
    s = coefs.to_coef_string()
    path = tmp_path / "archive.h5"
    write_coef_to_h5(path, s, "snap_000")
    assert read_coef_string(path, "snap_000") == s
    with pytest.raises(RuntimeError):
        write_coef_to_h5(path, s, "snap_000")
    pot = load_potential(path)
    test = np.array([[5.0, 1.0, -2.0]])
    np.testing.assert_allclose(np.asarray(pot.potential(test)),
                               np.asarray(pl.potential(test)), rtol=1e-5)


def test_load_evolving_from_archive(tmp_path, pts):
    a = PlummerPotential(mass=1e11, scaleRadius=5.0)
    b = PlummerPotential(mass=2e11, scaleRadius=5.0)
    grid = np.geomspace(0.1, 300, 30)
    strings = [make_spherical_coefs(p, grid).to_coef_string()
               for p in (a, b)]
    path = tmp_path / "evolv.h5"
    write_snapshot_coefs_to_h5(path, strings, times=[0.0, 1.0])
    ev = load_evolving_potential(path)
    mid = np.asarray(ev.potential(pts, t=0.5))
    exp = 0.5 * (np.asarray(a.potential(pts))
                 + np.asarray(b.potential(pts)))
    np.testing.assert_allclose(mid, exp, rtol=1e-4)


def test_evolving_multipole_stacked_fast_path():
    """Homogeneous Multipole snapshot sequences stack into a single
    lerped-coefficient evaluation (r1 weak #8: lax.switch over dozens of
    snapshots blew up compile time)."""
    from nbody_streams_tpu.potentials.modifiers import EvolvingPotential

    def make(mass):
        nfw = NFWPotential(mass=mass, scaleRadius=20.0)
        return MultipolePotential(make_spherical_coefs(
            nfw, np.geomspace(0.05, 500, 40)))

    T = 16
    masses = np.linspace(0.8e12, 1.4e12, T)
    times = np.linspace(0.0, 10.0, T)
    pots = [make(m) for m in masses]
    ev = EvolvingPotential(pots, times)
    assert ev._stacked is not None

    pts = np.array([[30.0, 5.0, -8.0], [100.0, 0.0, 0.0]])
    tq = 3.21
    i = int(np.searchsorted(times, tq) - 1)
    a = (tq - times[i]) / (times[i + 1] - times[i])
    expected = ((1 - a) * np.asarray(pots[i].potential(pts))
                + a * np.asarray(pots[i + 1].potential(pts)))
    got = np.asarray(ev.potential(pts, t=tq))
    np.testing.assert_allclose(got, expected, rtol=1e-6)
    assert np.isfinite(np.asarray(ev.force(pts, t=tq))).all()

    # heterogeneous sequences keep the switch path
    from nbody_streams_tpu.potentials.analytic import PlummerPotential

    ev2 = EvolvingPotential([make(1e12), PlummerPotential(mass=1e12),
                             make(1.1e12)], [0.0, 1.0, 2.0])
    assert ev2._stacked is None
    assert np.isfinite(np.asarray(ev2.potential(pts, t=0.5))).all()


def test_multipole_high_lmax_triaxial():
    """lmax=16 triaxial (45 surviving terms) and lmax=32 axisymmetric
    (17 pruned terms, via the GalPot disks) are the reference kernel's
    supported regimes; r1 review flagged the unrolled recurrence as a
    compile risk above lmax=8 — this pins that it builds, compiles and
    stays accurate."""
    from nbody_streams_tpu.potentials.analytic import LogHaloPotential

    lh = LogHaloPotential(velocity=200.0, coreRadius=5.0,
                          axisRatioY=0.8, axisRatioZ=0.6)
    mp = MultipolePotential.from_projection(
        lambda p: np.asarray(lh.potential(p)),
        np.geomspace(0.5, 300, 40), lmax=16)
    assert len(mp.labels) > 30          # many m-terms survive
    pts = np.random.default_rng(0).normal(0, 15, (50, 3))
    rel = np.abs(np.asarray(mp.potential(pts))
                 / np.asarray(lh.potential(pts)) - 1)
    assert rel.max() < 1e-5
    assert np.isfinite(np.asarray(mp.force(pts))).all()


def test_evolving_cylspline_stacked_fast_path():
    """Homogeneous CylSpline snapshot sequences also stack (FIRE
    star/gas components): node tensors + outer PowerLaw coefficients
    lerp in time through one traced evaluation."""
    from nbody_streams_tpu.potentials.modifiers import EvolvingPotential

    def make(mass):
        mn = MiyamotoNagaiPotential(mass=mass, scaleRadius=3.0,
                                    scaleHeight=0.4)
        r_grid = np.concatenate([[0.0], np.geomspace(0.1, 60.0, 24)])
        zp = np.geomspace(0.05, 12.0, 12)
        z_grid = np.concatenate([-zp[::-1], [0.0], zp])
        rr, zz = np.meshgrid(r_grid, z_grid, indexing="ij")
        p = np.column_stack([rr.ravel(), np.zeros(rr.size), zz.ravel()])
        tab = np.asarray(mn.potential(p)).reshape(rr.shape)
        return CylSplinePotential(CylSplineCoefs(
            R_grid=r_grid, z_grid=z_grid, m_values=[0], phi=tab[None]))

    T = 6
    times = np.linspace(0, 7, T)
    pots = [make(m) for m in np.linspace(4e10, 6e10, T)]
    ev = EvolvingPotential(pots, times)
    assert ev._stacked is not None and ev._stacked["kind"] == "cylspline"

    pts = np.array([[8.0, 2.0, 0.5], [20.0, 0.0, 3.0]])
    tq = 2.6
    i = int(np.searchsorted(times, tq) - 1)
    a = (tq - times[i]) / (times[i + 1] - times[i])
    expected = ((1 - a) * np.asarray(pots[i].potential(pts))
                + a * np.asarray(pots[i + 1].potential(pts)))
    got = np.asarray(ev.potential(pts, t=tq))
    # plain-scaling + shared-rscale rebuild differs from the members'
    # per-snapshot construction at the interpolant level only
    np.testing.assert_allclose(got, expected, rtol=2e-4)
    assert np.isfinite(np.asarray(ev.force(pts, t=tq))).all()


# ---------------------------------------------------------------------------
# r2 review regressions: modifiers / factory
# ---------------------------------------------------------------------------

def test_scaled_schedule_no_ringing_no_negative_tail():
    """Near-step amplitude tables must not ring (PCHIP) and must clamp,
    not extrapolate linearly negative, outside the range (r2 review)."""
    from nbody_streams_tpu.potentials import PlummerPotential
    from nbody_streams_tpu.potentials.modifiers import ScaledPotential

    pot = PlummerPotential(mass=1e10, scaleRadius=1.0)
    tab = np.array([[-5.0, 0.0, 1.0], [-2.2505, 0.0, 1.0],
                    [-2.25, 1.0, 1.0], [-1.75, 1.0, 1.0],
                    [-1.7495, 0.0, 1.0], [1.0, 0.0, 1.0]])
    sc = ScaledPotential(pot, tab)
    x = np.array([[2.0, 0.0, 0.0]])
    phi_ref = float(np.asarray(pot.potential(x))[0])
    for t in np.linspace(-6.0, 3.0, 121):
        phi = float(np.asarray(sc.potential(x, t=t))[0])
        ampl = phi / phi_ref
        assert -1e-12 <= ampl <= 1.0 + 1e-12, (t, ampl)
    # fully on inside the window, off outside
    assert float(np.asarray(sc.potential(x, t=-2.0))[0]) == \
        pytest.approx(phi_ref, rel=1e-12)
    assert abs(float(np.asarray(sc.potential(x, t=0.0))[0])) < 1e-10
    assert abs(float(np.asarray(sc.potential(x, t=-6.0))[0])) < 1e-10


def test_center_plus_scale_nesting_matches_agama():
    """Shifted is OUTERMOST: the minimum sits at `center`, not
    center*scale (reference _potential.py:2277-2305; r2 review)."""
    from nbody_streams_tpu.potentials import make_potential

    pot = make_potential(type='Plummer', mass=1e10, scaleRadius=1.0,
                         center=[50.0, 0.0, 0.0], scale=2.0)
    phi_at_c = float(np.asarray(pot.potential(
        np.array([[50.0, 0.0, 0.0]])))[0])
    phi_at_2c = float(np.asarray(pot.potential(
        np.array([[100.0, 0.0, 0.0]])))[0])
    assert phi_at_c < phi_at_2c          # deepest at the stated center


def test_ini_trailing_nonpotential_section_ignored(tmp_path):
    """Keys from trailing [SelfConsistentModel]-style sections must not
    bleed into the last [Potential] section (r2 review)."""
    ini = tmp_path / "scm.ini"
    ini.write_text(
        "[Potential halo]\ntype = NFW\nmass = 1e12\nscaleRadius = 20\n"
        "\n[SelfConsistentModel]\nrminSph = 0.005\nrmaxSph = 1000\n")
    from nbody_streams_tpu.potentials import load_potential_ini

    pot = load_potential_ini(ini)
    assert np.isfinite(np.asarray(
        pot.potential(np.array([[10.0, 0, 0]])))[0])


def test_stacked_evolving_agrees_beyond_radial_grid():
    """The stacked Multipole fast path must match the switch-based
    interpolation OUTSIDE the fitted radial grid too — lerping the
    extrapolation exponents is wrong there (r2 review)."""
    from nbody_streams_tpu.potentials import EvolvingPotential
    from nbody_streams_tpu.potentials.multipole import MultipolePotential

    def nfw_mult(mass, rs):
        from nbody_streams_tpu.potentials import NFWPotential

        p = NFWPotential(mass=mass, scaleRadius=rs)
        return MultipolePotential.from_projection(
            lambda pts: p.potential(pts),
            np.geomspace(0.1, 50.0, 40), lmax=0)

    pots = [nfw_mult(1e12, 16.0), nfw_mult(1.5e12, 18.0),
            nfw_mult(2e12, 20.0)]
    times = [0.0, 1.0, 2.0]
    ev = EvolvingPotential(pots, times)
    assert ev._stacked is not None       # fast path active
    ev_slow = EvolvingPotential(pots[:2], times[:2])  # switch path (n<3)
    assert ev_slow._stacked is None
    pts = np.array([[120.0, 0.0, 0.0],   # beyond r_max = 50
                    [0.03, 0.0, 0.0],    # inside r_min = 0.1
                    [30.0, 5.0, -2.0]])  # interior
    t = 0.5
    fast = np.asarray(ev.potential(pts, t=t))
    # the stacked path's semantics: plain-column construction per
    # snapshot, results lerped.  Before the fix the extrapolation
    # exponents v_in/v_out were lerped instead (nonlinear -> wrong
    # beyond the grid).
    plain = [MultipolePotential(p.coefs, monopole_scaling=False)
             for p in pots[:2]]
    ref = 0.5 * (np.asarray(plain[0].potential(pts, t=t))
                 + np.asarray(plain[1].potential(pts, t=t)))
    np.testing.assert_allclose(fast, ref, rtol=1e-6)
    # interior agrees with the full scaled construction too
    ref_scaled = 0.5 * (np.asarray(pots[0].potential(pts, t=t))
                        + np.asarray(pots[1].potential(pts, t=t)))
    np.testing.assert_allclose(fast[2], ref_scaled[2], rtol=1e-6)


def test_cylspline_m1_harmonic_axis_derivative():
    """|m| = 1 harmonics have a NONZERO radial derivative on the axis
    (Phi_1 ~ c(z) R): the zero-slope symmetry clamp must only apply to
    |m| != 1 (r2 review).  Off-centred Plummer = strong m=1 content."""
    from nbody_streams_tpu.potentials import PlummerPotential

    pl = PlummerPotential(mass=1e10, scaleRadius=2.0)
    shift = 1.5

    def phi_exact(pts):
        q = np.array(pts, float)
        q[:, 0] -= shift
        return np.asarray(pl.potential(q))

    r_grid = np.concatenate([[0.0], np.geomspace(0.05, 60.0, 40)])
    zp = np.geomspace(0.05, 60.0, 14)
    z_grid = np.concatenate([-zp[::-1], [0.0], zp])
    mmax, n_phi = 4, 16
    ang = 2.0 * np.pi * np.arange(n_phi) / n_phi
    rr, zz, aa = np.meshgrid(r_grid, z_grid, ang, indexing="ij")
    pts = np.column_stack([(rr * np.cos(aa)).ravel(),
                           (rr * np.sin(aa)).ravel(), zz.ravel()])
    tab = phi_exact(pts).reshape(rr.shape)          # (nR, nz, n_phi)
    spec = np.fft.rfft(tab, axis=2) / n_phi
    m_values = list(range(0, mmax + 1))             # y-symmetric: cos only
    tables = [spec[:, :, 0].real]
    for m in range(1, mmax + 1):
        fac = 1.0 if 2 * m == n_phi else 2.0
        tables.append(fac * spec[:, :, m].real)
    coefs = CylSplineCoefs(R_grid=r_grid, z_grid=z_grid,
                           m_values=m_values, phi=np.stack(tables))
    cs = CylSplinePotential(coefs)

    # near-axis probes across the first radial cell (the clamp region)
    probe = np.array([[0.01, 0.0, 1.0], [0.03, 0.02, -2.0],
                      [0.02, -0.01, 0.5], [0.04, 0.0, 3.0]])
    p_ref = phi_exact(probe)
    p_cs = np.asarray(cs.potential(probe))
    assert np.abs(p_cs - p_ref).max() / np.abs(p_ref).max() < 2e-4
    # the x-force near the axis is dominated by the m=1 term; with the
    # old all-m clamp it was biased across the whole first cell
    q = np.array(probe, float)
    q[:, 0] -= shift
    f_ref = np.asarray(pl.force(q))
    f_cs = np.asarray(cs.force(probe))
    assert np.abs(f_cs - f_ref).max() / np.abs(f_ref).max() < 5e-3


def test_coef_archive_rewrite_drops_stale_groups(tmp_path):
    """Re-packing an archive with FEWER snapshots must delete the old
    snap_* groups — stale ones desync from the times dataset and break
    the groups/times pairing on load."""
    from nbody_streams_tpu.potentials.io import (
        list_coef_groups,
        write_snapshot_coefs_to_h5,
    )

    path = tmp_path / "arch.h5"
    write_snapshot_coefs_to_h5(path, [f"c{i}" for i in range(6)],
                               times=np.arange(6.0))
    write_snapshot_coefs_to_h5(path, [f"d{i}" for i in range(3)],
                               times=np.arange(3.0))
    groups, times = list_coef_groups(path)
    assert groups == ["snap_000", "snap_001", "snap_002"]
    assert len(times) == 3


def test_loghalo_rejects_unknown_kwargs():
    """A typo'd kwarg must raise like every other analytic potential —
    the old **_ignored catch-all silently built default (wrong)
    physics.  G is still accepted (factory uniformity) and ignored."""
    from nbody_streams_tpu.potentials.analytic import LogHaloPotential

    with pytest.raises(TypeError):
        LogHaloPotential(velocty=220.0)  # codespell:ignore velocty
    a = LogHaloPotential(velocity=220.0, G=1.0)
    b = LogHaloPotential(velocity=220.0, G=4.3e-6)
    p = np.array([1.0, 2.0, 3.0])
    assert float(a.potential(p)) == float(b.potential(p))


def test_prep_promotes_integer_input_to_default_float():
    """Integer positions must evaluate at the default float width
    (float64 under x64, as in these tests) — the old hard-coded float32
    cast silently degraded the float64 pipeline to ~1e-7 accuracy."""
    from nbody_streams_tpu.potentials.analytic import NFWPotential

    pot = NFWPotential(mass=1e12, scaleRadius=20.0)
    phi_int = pot.potential(np.array([10, 0, 0]))
    phi_f64 = pot.potential(np.array([10.0, 0.0, 0.0]))
    assert np.asarray(phi_int).dtype == np.float64
    assert float(phi_int) == float(phi_f64)


def test_evolving_cylspline_stack_preserves_lmax_outer():
    """The stacked rebuild must reuse the snapshots' lmax_outer, not
    the class default of 8 — otherwise the outer continuation silently
    loses the harmonics the user asked for (r3 review)."""
    from nbody_streams_tpu.potentials.modifiers import EvolvingPotential

    def make(mass, lmax_outer):
        mn = MiyamotoNagaiPotential(mass=mass, scaleRadius=3.0,
                                    scaleHeight=0.4)
        r_grid = np.concatenate([[0.0], np.geomspace(0.1, 60.0, 24)])
        zp = np.geomspace(0.05, 12.0, 12)
        z_grid = np.concatenate([-zp[::-1], [0.0], zp])
        rr, zz = np.meshgrid(r_grid, z_grid, indexing="ij")
        p = np.column_stack([rr.ravel(), np.zeros(rr.size), zz.ravel()])
        tab = np.asarray(mn.potential(p)).reshape(rr.shape)
        return CylSplinePotential(CylSplineCoefs(
            R_grid=r_grid, z_grid=z_grid, m_values=[0], phi=tab[None]),
            lmax_outer=16)

    times = np.linspace(0, 5, 3)
    pots = [make(m, 16) for m in np.linspace(4e10, 6e10, 3)]
    assert pots[0].lmax_outer == 16
    ev = EvolvingPotential(pots, times)
    assert ev._stacked is not None
    assert ev._stacked["template"].lmax_outer == 16
    # outer-region values (beyond the grid) match the lerped members
    pts = np.array([[80.0, 10.0, 20.0], [0.0, 0.0, 90.0]])
    tq = 1.3
    i = int(np.searchsorted(times, tq) - 1)
    a = (tq - times[i]) / (times[i + 1] - times[i])
    expected = ((1 - a) * np.asarray(pots[i].potential(pts))
                + a * np.asarray(pots[i + 1].potential(pts)))
    np.testing.assert_allclose(np.asarray(ev.potential(pts, t=tq)),
                               expected, rtol=2e-4)


def test_repack_archive_without_times_drops_stale_times(tmp_path, pts):
    """Re-packing an archive with times=None must delete the previous
    'times' dataset — a same-length stale one would silently pair old
    epochs with new coefficients (r3 review)."""
    a = PlummerPotential(mass=1e11, scaleRadius=5.0)
    b = PlummerPotential(mass=2e11, scaleRadius=5.0)
    grid = np.geomspace(0.1, 300, 30)
    strings = [make_spherical_coefs(p, grid).to_coef_string()
               for p in (a, b)]
    path = tmp_path / "evolv.h5"
    write_snapshot_coefs_to_h5(path, strings, times=[0.0, 1.0])
    write_snapshot_coefs_to_h5(path, strings, times=None)
    import h5py

    with h5py.File(path, "r") as f:
        assert "times" not in f


def test_timestamps_block_accepts_semicolon_comments(tmp_path):
    """Agama-style ';' comments inside a Timestamps block must be
    skipped, same as the key/value parser (r3 review: float(';')
    ValueError)."""
    from nbody_streams_tpu.potentials import create_evolving_ini
    from nbody_streams_tpu.potentials.factory import load_potential_ini

    grid = np.geomspace(0.1, 300, 30)
    for i, mass in enumerate([1e11, 2e11]):
        p = PlummerPotential(mass=mass, scaleRadius=5.0)
        (tmp_path / f"s{i}.coef_mult").write_text(
            make_spherical_coefs(p, grid).to_coef_string())
    ini = create_evolving_ini(tmp_path / "ev.ini",
                              ["s0.coef_mult", "s1.coef_mult"], [0.0, 1.0])
    text = Path(ini).read_text().splitlines()
    k = next(i for i, ln in enumerate(text)
             if ln.strip().lower() == "timestamps")
    text.insert(k + 1, "; epochs in Gyr")
    Path(ini).write_text("\n".join(text) + "\n")
    pot = load_potential_ini(ini)
    q = np.array([3.0, 0.0, 0.0])
    mid = float(pot.potential(q, t=0.5))
    exp = 0.5 * (float(PlummerPotential(mass=1e11, scaleRadius=5.0)
                       .potential(q))
                 + float(PlummerPotential(mass=2e11, scaleRadius=5.0)
                         .potential(q)))
    assert abs(mid - exp) / abs(exp) < 1e-3


def test_galpot_conflicting_normalisation_raises():
    """mass= together with densityNorm=/surfaceDensity= must raise, not
    silently drop mass= (r3 review; Agama rejects the pair too)."""
    with pytest.raises(ValueError, match="not both"):
        make_potential(type="Spheroid", densityNorm=1.0, mass=1e12,
                       scaleRadius=5.0, outerCutoffRadius=50.0)
    with pytest.raises(ValueError, match="not both"):
        make_potential(type="Disk", surfaceDensity=1.0, mass=1e10,
                       scaleRadius=3.0, scaleHeight=0.3)


def test_evolving_duplicate_times_raises():
    """Duplicate snapshot epochs would lerp with 0/0 = NaN weights; the
    constructor must reject them (r3 review)."""
    ps = [PlummerPotential(mass=m, scaleRadius=5.0)
          for m in (1e11, 2e11, 3e11)]
    with pytest.raises(ValueError, match="distinct"):
        EvolvingPotential(ps, [0.0, 1.0, 1.0])


def test_shifted_single_row_trajectory_table():
    """A one-row (1,7) center table is a fixed offset, same as the
    (1,4) path (r3 review: SciPy ValueError from CubicHermiteSpline)."""
    inner = PlummerPotential(mass=1e11, scaleRadius=5.0)
    sp = ShiftedPotential(inner, np.array([[0.0, 1.0, 2.0, 3.0,
                                            0.1, 0.2, 0.3]]))
    q = np.array([10.0, 0.0, 0.0])
    exp = float(inner.potential(q - np.array([1.0, 2.0, 3.0])))
    assert float(sp.potential(q, t=4.0)) == pytest.approx(exp, rel=1e-12)


def test_eval_combined_matches_separate():
    """eval/evalDeriv share the forward pass (value_and_grad); results
    must equal the separate potential()/force() calls, including
    through modifiers and composites."""
    base = (PlummerPotential(mass=1e11, scaleRadius=5.0)
            + NFWPotential(mass=8e11, scaleRadius=16.0))
    pot = ScaledPotential(ShiftedPotential(base, [1.0, -2.0, 0.5]),
                          scale=1.2, ampl=0.9)
    pts = np.random.default_rng(0).normal(size=(7, 3)) * 30
    phi, f, d = pot.evalDeriv(pts)
    np.testing.assert_allclose(np.asarray(phi),
                               np.asarray(pot.potential(pts)), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(f),
                               np.asarray(pot.force(pts)), rtol=1e-12)
    p2, f2 = pot.eval(pts, pot=True, acc=True)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(phi))
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f))
