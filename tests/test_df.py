"""Native DF sampling (df.py) — the reference delegates equilibrium IC
generation to Agama's QuasiSpherical / QuasiIsothermal DFs
(reference: examples/MW_gpu_tree_stability.ipynb, fast_sims/_common.py:222).
"""
import numpy as np
import pytest

import nbody_streams_tpu as nst
from nbody_streams_tpu.constants import G_DEFAULT as G
from nbody_streams_tpu.potentials import PlummerPotential, make_potential


def _plummer_density(M, a):
    return lambda pts: (3 * M / (4 * np.pi * a**3)) * (
        1 + (np.linalg.norm(np.asarray(pts, float), axis=1) / a) ** 2
    ) ** -2.5


class TestQuasispherical:
    def test_plummer_sigma_matches_analytic(self):
        """Self-consistent Plummer: sigma_r^2 = G M / (6 sqrt(r^2+a^2))."""
        M, a = 1e9, 1.0
        pot = PlummerPotential(mass=M, scaleRadius=a, G=G)
        xv, m = nst.sample_quasispherical(
            _plummer_density(M, a), pot, 30000, seed=1,
            r_grid=np.geomspace(1e-3, 1e3, 256))
        assert np.isfinite(xv).all()
        assert m.sum() == pytest.approx(M, rel=1e-4)

        r = np.linalg.norm(xv[:, :3], axis=1)
        bins = np.geomspace(0.3, 4.0, 6)
        for lo, hi in zip(bins[:-1], bins[1:]):
            sel = (r >= lo) & (r < hi)
            vr = (xv[sel, :3] * xv[sel, 3:]).sum(1) / r[sel]
            rm = np.sqrt(lo * hi)
            sig_an = np.sqrt(G * M / (6 * np.sqrt(rm**2 + a**2)))
            assert vr.std() == pytest.approx(sig_an, rel=0.06)

    def test_plummer_virial_ratio(self):
        M, a = 1e9, 1.0
        pot = PlummerPotential(mass=M, scaleRadius=a, G=G)
        xv, m = nst.sample_quasispherical(
            _plummer_density(M, a), pot, 30000, seed=3,
            r_grid=np.geomspace(1e-3, 1e3, 256))
        KE = 0.5 * (m * (xv[:, 3:] ** 2).sum(1)).sum()
        PE = 0.5 * (m * np.asarray(pot.potential(xv[:, :3]), float)).sum()
        assert KE / abs(PE) == pytest.approx(0.5, abs=0.02)

    def test_radial_profile_matches_density(self):
        M, a = 5e8, 2.0
        pot = PlummerPotential(mass=M, scaleRadius=a, G=G)
        xv, m = nst.sample_quasispherical(
            _plummer_density(M, a), pot, 40000, seed=7,
            r_grid=np.geomspace(1e-3, 1e3, 256))
        r = np.linalg.norm(xv[:, :3], axis=1)
        # enclosed-mass fractions at r = a and 3a vs analytic
        # M(<r)/M = r^3 / (r^2 + a^2)^{3/2}
        for rq in (a, 3 * a):
            frac_an = rq**3 / (rq**2 + a**2) ** 1.5
            assert (r < rq).mean() == pytest.approx(frac_an, abs=0.01)

    def test_tracer_in_deeper_host_agrees_with_sigma_module(self):
        """Bulge tracer in a composite host: sampled sigma_r matches the
        Eddington-moment profile from friction.compute_sigma_r."""
        from nbody_streams_tpu.friction import compute_sigma_r

        host = make_potential(type='NFW', mass=8e11, scaleRadius=16.0)
        bulge = make_potential(type='Hernquist', mass=1e10, scaleRadius=0.6)
        pot = host + bulge
        xv, _ = nst.sample_quasispherical(
            bulge.density, pot, 30000, seed=11,
            r_grid=np.geomspace(1e-3, 5e2, 256))

        class _Tracer:
            def density(self, pts, t=0.0):
                return bulge.density(pts)

            def potential(self, pts, t=0.0):
                return pot.potential(pts)

            def force(self, pts, t=0.0):
                return pot.force(pts)

        sigma = compute_sigma_r(_Tracer(), method="quasispherical",
                                grid_r=np.geomspace(1e-3, 5e2, 200))
        r = np.linalg.norm(xv[:, :3], axis=1)
        for lo, hi in [(0.3, 0.6), (0.6, 1.2), (1.2, 2.5)]:
            sel = (r >= lo) & (r < hi)
            vr = (xv[sel, :3] * xv[sel, 3:]).sum(1) / r[sel]
            rm = np.sqrt(lo * hi)
            assert vr.std() == pytest.approx(
                float(sigma(np.array([rm]))[0]), rel=0.10)

    def test_rejects_nonmonotonic_psi(self):
        class _Bad:
            def potential(self, pts, t=0.0):
                r = np.linalg.norm(np.asarray(pts, float), axis=1)
                return np.sin(r)  # psi rises and falls

        with pytest.raises(ValueError):
            nst.eddington_df(_plummer_density(1e9, 1.0), _Bad(),
                             r_grid=np.geomspace(0.1, 10, 64))


class TestDisk:
    @pytest.fixture(scope="class")
    def mw(self):
        halo = make_potential(type='NFW', mass=1e12, scaleRadius=16.0)
        disk = make_potential(type='MiyamotoNagai', mass=5e10,
                              scaleRadius=3.0, scaleHeight=0.3)
        return halo + disk

    def test_vertical_structure_sech2(self, mw):
        xv, m = nst.sample_disk(30000, mw, mass=5e10, scaleRadius=3.0,
                                scaleHeight=-0.4, seed=2)
        # sech^2(z/2b)/(4b) has std = b pi / sqrt(3)
        assert xv[:, 2].std() == pytest.approx(0.4 * np.pi / np.sqrt(3),
                                               rel=0.03)
        assert m.sum() == pytest.approx(5e10, rel=1e-3)

    def test_vertical_structure_exponential(self, mw):
        xv, _ = nst.sample_disk(30000, mw, mass=5e10, scaleRadius=3.0,
                                scaleHeight=0.3, seed=5)
        # double-exponential |z| ~ Exp(hz): std = hz sqrt(2)
        assert xv[:, 2].std() == pytest.approx(0.3 * np.sqrt(2), rel=0.03)
        assert np.abs(np.median(xv[:, 2])) < 0.02

    def test_rotation_support_and_drift(self, mw):
        xv, _ = nst.sample_disk(30000, mw, mass=5e10, scaleRadius=3.0,
                                scaleHeight=-0.4, seed=2)
        R = np.hypot(xv[:, 0], xv[:, 1])
        vphi = (xv[:, 0] * xv[:, 4] - xv[:, 1] * xv[:, 3]) / R
        for Rl, Rh in [(4, 5), (7, 9), (11, 14)]:
            sel = (R >= Rl) & (R < Rh)
            Rm = np.sqrt(Rl * Rh)
            f = np.asarray(mw.force(np.array([[Rm, 0.0, 0.0]])), float)
            vc = np.sqrt(-Rm * f[0, 0])
            lag = vc - vphi[sel].mean()
            # rotation-supported (small but positive asymmetric drift)
            assert 0.0 < lag < 0.25 * vc
            # dispersions decline outward and stay subdominant
            assert vphi[sel].std() < 0.35 * vc

    def test_radial_profile(self, mw):
        xv, _ = nst.sample_disk(50000, mw, mass=5e10, scaleRadius=3.0,
                                scaleHeight=-0.4, seed=9)
        R = np.hypot(xv[:, 0], xv[:, 1])
        # exponential disk: M(<R)/M = 1 - (1 + R/Rd) exp(-R/Rd)
        for rq in (3.0, 6.0, 12.0):
            x = rq / 3.0
            frac_an = 1.0 - (1.0 + x) * np.exp(-x)
            assert (R < rq).mean() == pytest.approx(frac_an, abs=0.015)

    def test_explicit_sigma_r0(self, mw):
        xv, _ = nst.sample_disk(20000, mw, mass=5e10, scaleRadius=3.0,
                                scaleHeight=-0.4, sigma_r0=80.0,
                                Rsigma=6.0, seed=4)
        R = np.hypot(xv[:, 0], xv[:, 1])
        vR = (xv[:, 0] * xv[:, 3] + xv[:, 1] * xv[:, 4]) / R
        sel = (R > 5.5) & (R < 6.5)
        assert vR[sel].std() == pytest.approx(80.0 * np.exp(-1.0), rel=0.08)


def test_quasispherical_short_nbody_stays_in_equilibrium(tmp_path):
    """End-to-end: a sampled Plummer run through run_simulation keeps its
    half-mass radius (the IC is genuinely in equilibrium)."""
    M, a = 1e9, 1.0
    pot = PlummerPotential(mass=M, scaleRadius=a, G=G)
    xv, m = nst.sample_quasispherical(
        _plummer_density(M, a), pot, 2000, seed=13,
        r_grid=np.geomspace(1e-3, 1e3, 200))
    sp = nst.Species(name="star", N=2000, mass=float(m[0]), softening=0.05)
    r0 = np.median(np.linalg.norm(xv[:, :3], axis=1))
    t_dyn = np.sqrt(a**3 / (G * M))
    out = nst.run_simulation(xv, [sp], 0.0, 0.25 * t_dyn,
                             dt=0.005 * t_dyn, architecture="cpu",
                             save_snapshots=False, verbose=False)
    r1 = np.median(np.linalg.norm(out["star"][:, :3], axis=1))
    assert r1 == pytest.approx(r0, rel=0.08)


def test_sample_disk_surface_density_wins_over_mass():
    """Precedence matches build_disk: explicit surfaceDensity is kept and
    mass= is ignored, so matched IC + potential pairs built with the same
    kwargs stay self-consistent (r2 review)."""
    from nbody_streams_tpu.potentials import make_potential

    mw = make_potential(type='NFW', mass=1e12, scaleRadius=16.0)
    Rd = 3.0
    sigma0 = 800.0 * 1e6                       # Msun / kpc^2
    m_sigma = 2.0 * np.pi * sigma0 * Rd**2     # exp-disk total mass
    _, m_both = nst.sample_disk(2000, mw, surfaceDensity=sigma0,
                                mass=5e10, scaleRadius=Rd,
                                scaleHeight=0.3, seed=1)
    assert m_both.sum() == pytest.approx(m_sigma, rel=0.01)
    _, m_only = nst.sample_disk(2000, mw, surfaceDensity=sigma0,
                                scaleRadius=Rd, scaleHeight=0.3, seed=1)
    np.testing.assert_allclose(m_both, m_only)


def test_eddington_truncated_grid_no_extrapolation_bias():
    """A user-truncated r_grid must not bias f(E): the quadrature
    reaches psi -> 0 below the tabulated range, so the rho(psi) table
    is extended internally (r2 review: 18% low at the outer edge)."""
    from nbody_streams_tpu.potentials import PlummerPotential

    M, a = 1e9, 1.0
    pot = PlummerPotential(mass=M, scaleRadius=a)

    def rho(pts):
        r2 = (np.asarray(pts) ** 2).sum(1)
        return 3 * M / (4 * np.pi * a**3) * (1 + r2 / a**2) ** -2.5

    e, f, r, psi = nst.eddington_df(rho, pot,
                                    r_grid=np.geomspace(0.3, 10, 64))
    G = nst.G_DEFAULT
    f_an = (24 * np.sqrt(2) / (7 * np.pi**3) * a**2
            / (G**5 * M**4) * e**3.5)
    sel = (f > 0) & (r[::-1] <= 10.0)
    np.testing.assert_allclose(f[sel], f_an[sel], rtol=5e-3)


def test_sample_disk_rejects_zero_scale_height():
    from nbody_streams_tpu.potentials import make_potential

    mw = make_potential(type='NFW', mass=1e12, scaleRadius=16.0)
    with pytest.raises(ValueError, match="scaleHeight"):
        nst.sample_disk(100, mw, mass=5e9, scaleHeight=0.0)


def test_eddington_rejects_nonvanishing_potential():
    """Potentials with psi = -Phi <= 0 (e.g. a logarithmic halo) must
    raise the physics error, not return an all-NaN DF that kills the
    sampler's rejection loop later (r3 review)."""
    log = make_potential(type="Logarithmic", v0=220.0, coreRadius=1.0)
    with pytest.raises(ValueError, match="vanishes at infinity"):
        nst.eddington_df(_plummer_density(1e9, 1.0), log)


def test_native_stale_library_falls_back(monkeypatch):
    """A stale .so missing a symbol (ctypes AttributeError) must report
    native_available() == False, not crash (r3 review)."""
    from pathlib import Path

    from nbody_streams_tpu import native

    class _Empty:  # dlsym on any attribute fails
        def __getattr__(self, name):
            raise AttributeError(name)

    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_LIB_PATH", Path(native.__file__))
    monkeypatch.setattr(native.ctypes, "CDLL", lambda p: _Empty())
    assert native.native_available() is False
