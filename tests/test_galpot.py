"""GalPot-style native density->potential builders (potentials/galpot.py).

Validates the replacement for the reference's Agama-routed factory types
(reference: agama_helper/_potential.py:2109-2232) against:
* an independent Hankel-transform oracle for exponential disks,
* closed-form spherical potentials (Hernquist limit of a Spheroid),
* autodiff-Laplacian density recovery for flattened/sech2 models,
* the shipped McMillan17.ini MW model (published Vc(8.21) = 233.1 km/s).
"""
import numpy as np
import pytest

from nbody_streams_tpu.constants import G_DEFAULT as G
from nbody_streams_tpu.potentials.factory import make_potential
from nbody_streams_tpu.potentials.galpot import (
    DiskDensity,
    SersicDensity,
    SpheroidDensity,
    build_disk,
    build_sersic,
    build_spheroid,
    density_to_multipole,
)

from pathlib import Path

REF_INI = str(Path(__file__).resolve().parent.parent
              / "nbody_streams_tpu/data/potentials/McMillan17.ini")


def _phi_disk_hankel(R, z, S0, Rd, h):
    """Independent oracle: exact Hankel-transform potential of an
    exponential disk rho = S0 exp(-R/Rd) exp(-|z|/h)/2h.

    Phi(R,z) = -2 pi G int Sigma~(k) J0(kR) K(z,k) dk with the analytic
    Sigma~(k) = S0 Rd^2 (1+(k Rd)^2)^{-3/2} and the exact 1-D Helmholtz
    convolution K of the exponential vertical profile.
    """
    from scipy.special import j0, jn_zeros

    az = abs(z)

    def K(k):
        kh = k * h
        t1 = (np.exp(-k * az) + np.exp(-az / h)) / (2.0 * (1.0 + kh))
        mask = np.abs(kh - 1.0) > 1e-8
        t2 = np.where(mask,
                      (np.exp(-az / h) - np.exp(-k * az))
                      / (2.0 * np.where(mask, kh - 1.0, 1.0)),
                      az / (2.0 * h) * np.exp(-az / h))
        return t1 + t2

    zeros = jn_zeros(0, 400) / max(R, 1e-9)
    edges = np.unique(np.concatenate([
        [0.0], zeros[zeros < 20000.0], np.geomspace(1e-3, 40000.0, 120)]))
    x, w = np.polynomial.legendre.leggauss(16)
    lo, hi = edges[:-1], edges[1:]
    kk = ((lo + hi)[:, None] / 2 + (hi - lo)[:, None] / 2 * x[None, :]).ravel()
    ww = ((hi - lo)[:, None] / 2 * w[None, :]).ravel()
    integ = S0 * Rd**2 * (1 + (kk * Rd) ** 2) ** (-1.5) * j0(kk * R) * K(kk)
    return -2.0 * np.pi * G * np.sum(ww * integ)


class TestDisk:
    def test_exponential_disk_vs_hankel_oracle(self):
        S0, Rd, h = 8.95679e8, 2.49955, 0.3   # McMillan17 thin disk
        pot = build_disk(surfaceDensity=S0, scaleRadius=Rd, scaleHeight=h)
        for R, z in [(0.2, 0.1), (2.0, 0.3), (8.2, 0.0), (8.2, 1.0),
                     (20.0, 5.0), (50.0, 2.0)]:
            ref = _phi_disk_hankel(R, z, S0, Rd, h)
            got = float(np.asarray(pot.potential(np.array([[R, 0, z]])))[0])
            assert got == pytest.approx(ref, rel=1e-4), (R, z)

    def test_density_recovery_exp_and_sech2(self):
        # autodiff Laplacian of the built potential reproduces the input
        # density (incl. the sech2 branch the reference's GPU DiskAnsatz
        # kernel lacks, _analytic_potentials.py:958)
        rng = np.random.default_rng(2)
        pts = np.column_stack([rng.uniform(0.3, 12, 50),
                               np.zeros(50), rng.uniform(-1.0, 1.0, 50)])
        for kw in (dict(surfaceDensity=1e9, scaleRadius=3.0,
                        scaleHeight=0.25),
                   dict(surfaceDensity=5.3e7, scaleRadius=7.0,
                        scaleHeight=-0.085, innerCutoffRadius=4.0)):
            pot = build_disk(**kw)
            dens = DiskDensity(**kw)
            rho_in = dens(pts)
            rho_out = np.asarray(pot.density(pts))
            assert np.abs(rho_out - rho_in).max() < 2e-3 * rho_in.max()

    def test_monopole_mass_closure(self):
        # residual multipole carries the full disk mass (the ansatz term
        # integrates to zero); node-exact quadrature check
        kw = dict(surfaceDensity=2.18e9, scaleRadius=1.5,
                  scaleHeight=-0.045, innerCutoffRadius=12.0)
        dens = DiskDensity(**kw)
        import math
        r_grid = np.geomspace(0.01, 300.0, 40)
        coefs = density_to_multipole(
            dens.residual, r_grid, [(0, 0)], n_theta=320,
            theta_cluster=math.log(4 * 1.5 / 0.045))
        m_enc = coefs.dphi_dr[-1, 0] * r_grid[-1] ** 2 / G
        assert m_enc == pytest.approx(dens.total_mass(), rel=1e-6)

    def test_razor_thin_raises(self):
        with pytest.raises(NotImplementedError):
            build_disk(surfaceDensity=1e9, scaleRadius=3.0, scaleHeight=0.0)


class TestSpheroid:
    def test_hernquist_limit(self):
        from nbody_streams_tpu.potentials.analytic import HernquistPotential

        M, a = 1e12, 20.0
        sp = build_spheroid(densityNorm=M / (2 * np.pi * a**3),
                            scaleRadius=a, alpha=1, beta=4, gamma=1)
        hq = HernquistPotential(mass=M, scaleRadius=a)
        r = np.geomspace(0.2, 3000, 30)
        tp = np.column_stack([r, 0 * r, 0 * r])
        assert np.abs(np.asarray(sp.potential(tp))
                      / np.asarray(hq.potential(tp)) - 1).max() < 1e-6
        assert np.abs(np.asarray(sp.force(tp))[:, 0]
                      / np.asarray(hq.force(tp))[:, 0] - 1).max() < 1e-5

    def test_mass_normalisation(self):
        # mass= normalisation matches densityNorm= route
        M, a = 5e11, 15.0
        sp = build_spheroid(mass=M, scaleRadius=a, alpha=1, beta=4, gamma=1)
        r_far = 1e5
        f = np.asarray(sp.force(np.array([[r_far, 0, 0]])))[0, 0]
        assert -f * r_far**2 / G == pytest.approx(M, rel=1e-3)

    def test_flattened_bulge_density_recovery(self):
        kw = dict(densityNorm=9.8351e10, axisRatioZ=0.5, gamma=0, beta=1.8,
                  scaleRadius=0.075, outerCutoffRadius=2.1)
        pot = build_spheroid(**kw)
        dens = SpheroidDensity(**kw)
        rng = np.random.default_rng(0)
        pts = rng.uniform(-1.2, 1.2, (60, 3))
        pts = pts[np.linalg.norm(pts, axis=1) > 0.05]
        rho_in = dens(pts)
        rho_out = np.asarray(pot.density(pts))
        assert np.abs(rho_out - rho_in).max() < 2e-4 * rho_in.max()

    def test_beta2_needs_cutoff(self):
        with pytest.raises(ValueError):
            SpheroidDensity(beta=2.0)


class TestSersicKing:
    def test_sersic_total_mass_and_profile(self):
        M, re = 4e10, 1.0
        pot = build_sersic(mass=M, scaleRadius=re, sersicIndex=4.0)
        r_far = 1e4
        f = np.asarray(pot.force(np.array([[r_far, 0, 0]])))[0, 0]
        assert -f * r_far**2 / G == pytest.approx(M, rel=1e-3)
        # deprojected density is positive and decreasing
        dens = SersicDensity(mass=M, scaleRadius=re, sersicIndex=4.0)
        r = np.geomspace(0.01, 20, 50)
        rho = dens.rho_m(r)
        assert np.all(rho > 0) and np.all(np.diff(rho) < 0)

    def test_king_factory(self):
        pot = make_potential(type="King", mass=1e5, scaleRadius=0.01,
                             W0=5.0)
        phi0 = float(np.asarray(pot.potential(np.zeros((1, 3))))[0])
        assert phi0 < 0
        # Keplerian outside the tidal radius
        f = np.asarray(pot.force(np.array([[5.0, 0, 0]])))[0, 0]
        assert -f * 25.0 / G == pytest.approx(1e5, rel=1e-3)

    def test_triaxial_dehnen_vs_spherical(self):
        from nbody_streams_tpu.potentials.analytic import DehnenPotential

        M, a, g = 1e11, 5.0, 1.5
        tri = make_potential(type="Dehnen", mass=M, scaleRadius=a,
                             gamma=g, axisRatioZ=0.9999999)
        sph = DehnenPotential(mass=M, scaleRadius=a, gamma=g)
        r = np.geomspace(0.5, 200, 20)
        tp = np.column_stack([r, 0 * r, 0 * r])
        assert np.abs(np.asarray(tri.potential(tp))
                      / np.asarray(sph.potential(tp)) - 1).max() < 1e-4


class TestMcMillan17:
    def test_loads_and_matches_published_vc(self):
        pot = make_potential(file=REF_INI)
        R0 = 8.21
        f = np.asarray(pot.force(np.array([[R0, 0.0, 0.0]])))[0]
        vc = np.sqrt(-f[0] * R0)
        # McMillan (2017) best-fit: v_c(R0) = 233.1 km/s
        assert vc == pytest.approx(233.1, rel=0.01)

    def test_vertical_force_sign_and_symmetry(self):
        pot = make_potential(file=REF_INI)
        f = np.asarray(pot.force(np.array([[8.2, 0, 0.5], [8.2, 0, -0.5]])))
        assert f[0, 2] < 0 < f[1, 2]
        assert f[0, 2] == pytest.approx(-f[1, 2], rel=1e-8)


def test_spheroid_mass_normalisation_rejects_divergent_beta():
    """mass= normalisation with beta <= 3 and no cutoff would divide by
    an arbitrary truncation-dependent total mass (r2 review)."""
    import pytest

    from nbody_streams_tpu.potentials.galpot import build_spheroid

    with pytest.raises(ValueError, match="infinite total mass"):
        build_spheroid(mass=1e12, gamma=1.0, beta=3.0, scaleRadius=15.0)
    # with a cutoff the same profile is fine
    build_spheroid(mass=1e10, gamma=1.0, beta=3.0, scaleRadius=2.0,
                   outerCutoffRadius=30.0, lmax=0, gridSizeR=24)


def test_disk_mass_normalisation_high_sersic_index():
    """mass= normalisation must capture the full Sersic-n mass: a fixed
    200 Rd truncation misses most of it for n >= 3 (r2 review).
    Analytic check: M = 2 pi Sigma0 Rd^2 n Gamma(2n)."""
    from math import gamma, pi

    from nbody_streams_tpu.potentials.galpot import DiskDensity

    for n_ser in (1.0, 2.0, 4.0):
        d = DiskDensity(surfaceDensity=1.0, scaleRadius=2.0,
                        scaleHeight=0.3, sersicIndex=n_ser)
        analytic = 2.0 * pi * 1.0 * 4.0 * n_ser * gamma(2.0 * n_ser)
        assert d.total_mass() == pytest.approx(analytic, rel=1e-6), n_ser


def test_spheroid_mass_shallow_cutoff_and_near_critical_beta():
    """Cutoff extent must scale with cutoffStrength, and the beta > 3
    no-cutoff case needs the analytic power-law tail (r2 review).
    Analytic check for gamma=0, alpha=1, beta=4 (no cutoff):
    M = 4 pi rho0 a^3 int u^2/(1+u)^4 du = 4 pi rho0 a^3 / 3."""
    import numpy as np
    from math import gamma as G, pi

    from nbody_streams_tpu.potentials.galpot import SpheroidDensity

    s = SpheroidDensity(densityNorm=1.0, scaleRadius=2.0, alpha=1.0,
                        beta=4.0, gamma=0.0)
    assert s.total_mass() == pytest.approx(4.0 * pi * 8.0 / 3.0, rel=1e-6)
    # shallow cutoff: rho = exp(-(r/rc)^0.5) (gamma=0, beta=0 via large
    # scaleRadius) -> M = 4 pi rc^3 Gamma(6)/... : int r^2 e^-(r/rc)^.5 dr
    # = 2 rc^3 int y^5 e^-y dy = 2 rc^3 Gamma(6) = 240 rc^3
    s2 = SpheroidDensity(densityNorm=1.0, scaleRadius=1e8, alpha=1.0,
                         beta=4.0, gamma=0.0, outerCutoffRadius=3.0,
                         cutoffStrength=0.5)
    expect = 4.0 * pi * 2.0 * 27.0 * G(6.0)
    assert s2.total_mass() == pytest.approx(expect, rel=1e-4)
    # near-critical beta without cutoff: analytic tail keeps it finite
    # and accurate: gamma=0, alpha=1, beta=3.5:
    # M = 4 pi a^3 int u^2 (1+u)^-3.5 du = 4 pi a^3 * B-type value
    from scipy.integrate import quad

    val, _ = quad(lambda u: u * u * (1 + u) ** -3.5, 0, np.inf)
    s3 = SpheroidDensity(densityNorm=1.0, scaleRadius=2.0, alpha=1.0,
                         beta=3.5, gamma=0.0)
    assert s3.total_mass() == pytest.approx(4.0 * pi * 8.0 * val,
                                            rel=1e-3)
