"""Reference-name drop-in compatibility tier.

The migration contract (docs/migrating_from_reference.md) is that a
reference (appy2806/Nbody_streams) user can switch imports and keep
their call sites.  These tests exercise every reference-public symbol
that the native API exposes under a different name or call form:

* ``*PotentialGPU`` class aliases (reference agama_helper/
  _analytic_potentials.py, _potential.py)
* ``load_agama_potential`` / ``load_agama_evolving_potential``
  (reference agama_helper/_load.py:91,234) incl. ``dataset_name``,
  ``group_names``, int-l keep shorthand and ``include_negative_m``
* ``create_snapshot_dict`` + FIRE-style nested dicts through
  ``fit_potential`` with ``sym=``/``pole_l=`` aliases (reference
  agama_helper/_fit.py:44,133)
* ``chandrasekhar_friction`` (reference _chandrasekhar.py:439)
* reference-contract ``iterative_unbinding`` /
  ``compute_iterative_boundness`` (reference utils/main.py:1714,1722)
* reference call forms of ``viz.render_surface_density``,
  ``get_smoothing_lengths`` and ``plot_density`` kwargs (reference
  viz/sph_kernels.py:118,638; viz/plots.py:110)
"""
import types
import warnings
from pathlib import Path

import numpy as np
import pytest

import nbody_streams_tpu.potentials as P


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(42)


# ---------------------------------------------------------------------------
# module-path aliases
# ---------------------------------------------------------------------------

def test_reference_module_paths_resolve():
    """The reference's submodule import paths work after the package
    rename (reference: agama_helper/__init__.py, tree_gpu/__init__.py,
    fields.py, viz/sph_kernels.py)."""
    from nbody_streams_tpu import agama_helper, tree_gpu

    assert agama_helper.fit_potential is P.fit_potential
    assert agama_helper.PotentialGPU is P.make_potential
    assert agama_helper.MultipoleCoefs is P.MultipoleCoefs
    assert agama_helper.load_agama_potential is P.load_agama_potential
    from nbody_streams_tpu.tree import TreeGPU, tree_gravity_gpu
    assert tree_gpu.TreeGPU is TreeGPU
    assert tree_gpu.tree_gravity_gpu is tree_gravity_gpu
    assert callable(tree_gpu.cuda_alive)
    # every reference-public agama_helper name is re-exported
    ref_names = {
        "PotentialGPU", "create_snapshot_dict", "fit_potential",
        "write_coef_to_h5", "write_snapshot_coefs_to_h5", "read_coefs",
        "read_coef_string", "MultipoleCoefs", "CylSplineCoefs",
        "generate_lmax_pairs", "load_agama_potential",
        "load_agama_evolving_potential", "create_evolving_ini",
        "load_fire_pot", "read_snapshot_times",
        "create_fire_evolving_ini"}
    assert ref_names <= set(agama_helper.__all__)


def test_fields_module_alias(rng):
    import nbody_streams_tpu as nst
    from nbody_streams_tpu import fields

    assert fields.compute_nbody_forces_gpu is nst.compute_forces_direct
    assert fields.compute_nbody_potential_cpu is nst.compute_potential_direct
    pos = rng.normal(0, 1, (64, 3))
    acc = np.asarray(fields.compute_nbody_forces_gpu(
        pos, np.full(64, 1e6), 0.05))
    assert acc.shape == (64, 3) and np.isfinite(acc).all()
    assert isinstance(fields.get_gpu_info(), dict)


def test_sph_kernels_module_alias(rng):
    """render_cpu/render_gpu take the reference's positional-h signature
    (sph_kernels.py:381,532) and return the [ix, iy] grid layout."""
    from nbody_streams_tpu.viz import sph_kernels
    from nbody_streams_tpu.viz import render_surface_density

    n = 2000
    x = rng.normal(0, 20, n)
    y = rng.normal(0, 20, n)
    m = np.ones(n)
    h = sph_kernels.get_smoothing_lengths(np.column_stack([x, y]),
                                          k_neighbors=16)
    g_cpu = sph_kernels.render_cpu(x, y, m, h, 64, 120.0)
    g_gpu = sph_kernels.render_gpu(x, y, m, h, resolution=64,
                                   gridsize=120.0, chunk_size=1)
    np.testing.assert_array_equal(g_cpu, g_gpu)
    assert g_cpu.shape == (64, 64)
    # same splat as the public entry point with explicit h
    g_pub, _ = render_surface_density(x, y, m, h=h, resolution=64,
                                      gridsize=120.0)
    np.testing.assert_allclose(g_cpu, g_pub, rtol=1e-6, atol=1e-8)


# ---------------------------------------------------------------------------
# potential class aliases
# ---------------------------------------------------------------------------

def test_gpu_class_aliases_are_native_classes():
    assert P.NFWPotentialGPU is P.NFWPotential
    assert P.PlummerPotentialGPU is P.PlummerPotential
    assert P.HernquistPotentialGPU is P.HernquistPotential
    assert P.DehnenSphericalPotentialGPU is P.DehnenPotential
    assert P.IsochronePotentialGPU is P.IsochronePotential
    assert P.MiyamotoNagaiPotentialGPU is P.MiyamotoNagaiPotential
    assert P.LogHaloPotentialGPU is P.LogHaloPotential
    assert P.DiskAnsatzPotentialGPU is P.DiskAnsatzPotential
    assert P.UniformAccelerationGPU is P.UniformAcceleration
    assert P.AnalyticPotentialGPU is P.AnalyticPotential
    assert P.CompositePotentialGPU is P.CompositePotential
    assert P.MultipolePotentialGPU is P.MultipolePotential
    assert P.CylSplinePotentialGPU is P.CylSplinePotential
    assert P.PotentialGPU is P.make_potential
    # reference constructor form runs unchanged
    pot = P.NFWPotentialGPU(mass=1e12, scaleRadius=20.0)
    phi = float(pot.potential(np.array([8.0, 0.0, 0.0])))
    assert phi < 0 and np.isfinite(phi)


# ---------------------------------------------------------------------------
# load_agama_* wrappers
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def mult_coefs():
    pl = P.PlummerPotential(mass=1e11, scaleRadius=5.0)
    r_grid = np.geomspace(0.5, 80, 20)
    pts_r = np.column_stack([r_grid, 0 * r_grid, 0 * r_grid])
    phi = np.asarray(pl.potential(pts_r))
    dphi = -np.asarray(pl.force(pts_r))[:, 0]
    return P.MultipoleCoefs(R_grid=r_grid, lm_labels=[(0, 0)],
                            phi=phi[:, None], dphi_dr=dphi[:, None])


@pytest.fixture(scope="module")
def quad_coefs(mult_coefs):
    """Monopole coefs widened with synthetic l=2 rows so harmonic
    filtering has something to cut."""
    from nbody_streams_tpu.potentials import MultipoleCoefs

    labels = list(mult_coefs.lm_labels) + [(2, -1), (2, 0), (2, 1)]
    nR = len(mult_coefs.R_grid)
    extra = np.tile(0.01 * mult_coefs.phi[:, :1], (1, 3))
    phi = np.concatenate([mult_coefs.phi, extra], axis=1)
    dphi = (np.concatenate([mult_coefs.dphi_dr,
                            np.tile(0.01 * mult_coefs.dphi_dr[:, :1],
                                    (1, 3))], axis=1)
            if mult_coefs.dphi_dr is not None else None)
    assert phi.shape == (nR, len(labels))
    return MultipoleCoefs(mult_coefs.R_grid.copy(), labels, phi, dphi,
                          dict(mult_coefs.metadata))


def test_load_agama_potential_dataset_name(tmp_path, mult_coefs):
    arch = tmp_path / "arch.h5"
    P.write_coef_to_h5(arch, mult_coefs.to_coef_string(),
                       group_name="snap_007", dataset_name="alt")
    pot = P.load_agama_potential(arch, group_name="snap_007",
                                 dataset_name="alt")
    xyz = np.array([3.0, 4.0, 0.0])
    ref = P.load_potential(mult_coefs)
    np.testing.assert_allclose(float(pot.potential(xyz)),
                               float(ref.potential(xyz)), rtol=1e-6)


def test_load_agama_potential_int_l_shorthand(quad_coefs):
    # keep_lm_mult=[0] keeps all monopole terms, zeroes the l=2 block
    pot_l0 = P.load_agama_potential(quad_coefs, keep_lm_mult=[0])
    mono = P.load_potential(quad_coefs.zeroed([(0, 0)]))
    xyz = np.array([[2.0, 1.0, 3.0], [5.0, -2.0, 0.5]])
    np.testing.assert_allclose(np.asarray(pot_l0.potential(xyz)),
                               np.asarray(mono.potential(xyz)),
                               rtol=1e-6)


def test_load_agama_potential_negative_m_expansion(quad_coefs):
    # (2, 1) auto-includes (2, -1) by default ...
    with_neg = P.load_agama_potential(quad_coefs,
                                      keep_lm_mult=[(0, 0), (2, 1)])
    # ... and keeps it out when include_negative_m=False
    without = P.load_agama_potential(quad_coefs,
                                     keep_lm_mult=[(0, 0), (2, 1)],
                                     include_negative_m=False)
    xyz = np.array([1.5, 2.5, 0.5])
    v_with = float(with_neg.potential(xyz))
    v_without = float(without.potential(xyz))
    oracle_with = P.load_potential(
        quad_coefs.zeroed([(0, 0), (2, 1), (2, -1)]))
    oracle_without = P.load_potential(
        quad_coefs.zeroed([(0, 0), (2, 1)], include_negative=False))
    np.testing.assert_allclose(v_with,
                               float(oracle_with.potential(xyz)),
                               rtol=1e-6)
    np.testing.assert_allclose(v_without,
                               float(oracle_without.potential(xyz)),
                               rtol=1e-6)
    assert v_with != pytest.approx(v_without, rel=1e-9)


def test_load_agama_evolving_group_names(tmp_path, mult_coefs):
    from nbody_streams_tpu.potentials import read_mult_coefs

    arch = tmp_path / "evolv.h5"
    scaled = read_mult_coefs(mult_coefs.to_coef_string())
    scaled.phi *= 2.0
    if scaled.dphi_dr is not None:
        scaled.dphi_dr *= 2.0
    P.write_snapshot_coefs_to_h5(
        arch,
        [mult_coefs.to_coef_string(), scaled.to_coef_string()],
        times=[0.0, 1.0])
    # full archive via the reference name + interp_linear alias
    pot = P.load_agama_evolving_potential(arch, interp_linear=True)
    xyz = np.array([4.0, 0.0, 3.0])
    v0 = float(pot.potential(xyz, t=0.0))
    v1 = float(pot.potential(xyz, t=1.0))
    vh = float(pot.potential(xyz, t=0.5))
    np.testing.assert_allclose(vh, 0.5 * (v0 + v1), rtol=1e-5)
    # group_names selects a single snapshot (static in t)
    pot1 = P.load_agama_evolving_potential(
        arch, times=[0.0], group_names=["snap_001"])
    np.testing.assert_allclose(float(pot1.potential(xyz, t=0.0)), v1,
                               rtol=1e-6)


def test_load_agama_evolving_group_names_missing(tmp_path, mult_coefs):
    arch = tmp_path / "one.h5"
    P.write_snapshot_coefs_to_h5(
        arch, [mult_coefs.to_coef_string()], times=[0.0])
    with pytest.raises(ValueError, match="not in archive"):
        P.load_agama_evolving_potential(arch, group_names=["snap_xyz"])


# ---------------------------------------------------------------------------
# create_snapshot_dict + fit_potential reference forms
# ---------------------------------------------------------------------------

def test_create_snapshot_dict_layout(rng):
    pd = rng.normal(0, 30, (100, 3))
    md = np.full(100, 1e7)
    pg = rng.normal(0, 10, (40, 3))
    mg = np.full(40, 1e5)
    tg = np.full(40, 1e3)
    snap = P.create_snapshot_dict(pd, md, pos_gas=pg, mass_gas=mg,
                                  temperature_gas=tg)
    assert set(snap) == {"dark", "star", "gas"}
    assert snap["star"] == {}
    np.testing.assert_array_equal(snap["dark"]["host.distance"], pd)
    np.testing.assert_array_equal(snap["gas"]["temperature"], tg)
    with pytest.raises(ValueError, match="must be given together"):
        P.create_snapshot_dict(pd, md, pos_star=pd)
    with pytest.raises(ValueError, match="shape"):
        P.create_snapshot_dict(pd[:, :2], md)
    with pytest.raises(ValueError, match="temperature_gas requires"):
        P.create_snapshot_dict(pd, md, temperature_gas=tg)


def test_fit_potential_nested_dict_matches_native(rng):
    pd = rng.normal(0, 30, (1500, 3))
    md = np.full(1500, 1e7)
    ps = rng.normal(0, 5, (400, 3))
    ms = np.full(400, 1e5)
    pg = rng.normal(0, 10, (200, 3))
    mg = np.full(200, 1e5)
    tg = 10 ** rng.uniform(3.0, 6.0, 200)
    snap = P.create_snapshot_dict(pd, md, ps, ms, pg, mg, tg)
    # reference aliases: sym= -> symmetry, pole_l= -> lmax
    out_ref = P.fit_potential(snap, sym="a", pole_l=4, mmax_cyl=2)
    cold = np.log10(tg) < 4.5
    out_nat = P.fit_potential(
        {"dark": (pd, md), "star": (ps, ms),
         "cold_gas": (pg[cold], mg[cold]),
         "hot_gas": (pg[~cold], mg[~cold])},
        symmetry="a", lmax=4, mmax_cyl=2)
    np.testing.assert_allclose(out_ref["multipole"].phi,
                               out_nat["multipole"].phi, rtol=1e-10)
    np.testing.assert_allclose(out_ref["cylspline"].phi,
                               out_nat["cylspline"].phi, rtol=1e-10)


def test_fit_potential_multi_sym_list_rejected(rng):
    pd = rng.normal(0, 10, (50, 3))
    snap = {"dark": (pd, np.ones(50))}
    with pytest.raises(ValueError, match="one file per symmetry"):
        P.fit_potential(snap, sym=["n", "a"])
    with pytest.raises(ValueError, match="one file per order"):
        P.fit_potential(snap, pole_l=[2, 4])


# ---------------------------------------------------------------------------
# chandrasekhar_friction
# ---------------------------------------------------------------------------

def test_chandrasekhar_friction_matches_accel(rng):
    from nbody_streams_tpu.friction import (chandrasekhar_accel,
                                            chandrasekhar_friction)

    pot = P.NFWPotential(mass=1e12, scaleRadius=20.0)
    r_com = np.array([8.0, 3.0, -2.0])
    v_com = np.array([50.0, 180.0, -30.0])
    sigma = 150.0
    a_ref = chandrasekhar_friction(r_com, v_com, 1e10, pot,
                                   lambda r: sigma, 0.0,
                                   coulomb_mode="fixed",
                                   fixed_ln_lambda=4.0)
    rho = float(np.asarray(pot.density(r_com, 0.0)).ravel()[0])
    a_nat = np.asarray(chandrasekhar_accel(
        r_com, v_com, 1e10, rho, sigma, 0.0, coulomb_mode="fixed",
        fixed_ln_lambda=4.0))
    np.testing.assert_allclose(a_ref, a_nat, rtol=1e-6)
    assert a_ref.shape == (3,)
    # at rest -> exactly zero, like the reference early-out
    np.testing.assert_array_equal(
        chandrasekhar_friction(r_com, np.zeros(3), 1e10, pot,
                               lambda r: sigma, 0.0),
        np.zeros(3))


# ---------------------------------------------------------------------------
# reference-contract unbinding
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def bound_cluster(rng):
    """A tight Plummer-ish clump plus a handful of escapers."""
    n = 400
    pos = rng.normal(0.0, 0.5, (n, 3))
    vel = rng.normal(0.0, 1.0, (n, 3))      # km/s-scale, bound for M=1e8
    mass = np.full(n, 1e8 / n)
    pos[:5] += 40.0                          # far + fast -> unbound
    vel[:5] = 300.0
    return pos, vel, mass


def test_unbinding_reference_contract(bound_cluster):
    from nbody_streams_tpu.utils import iterative_unbinding

    pos, vel, mass = bound_cluster
    (bound_dark,), cp, cv = iterative_unbinding(
        pos, vel, mass, potential_compute_method="direct",
        softening=0.05, verbose=False)
    assert bound_dark.dtype != bool          # int mask, like the reference
    assert set(np.unique(bound_dark)) <= {0, 1}
    assert bound_dark[:5].sum() == 0         # escapers cut
    assert bound_dark[5:].mean() > 0.8
    assert cp.shape == (3,) and cv.shape == (3,)
    assert np.all(np.abs(cp) < 5.0)          # centre found on the clump


def test_unbinding_reference_two_species_and_history(bound_cluster):
    from nbody_streams_tpu.utils import iterative_unbinding

    pos, vel, mass = bound_cluster
    res, cp, cv = iterative_unbinding(
        pos[5:], vel[5:], mass[5:], pos_star=pos[:5], vel_star=vel[:5],
        mass_star=mass[:5], potential_compute_method="direct",
        softening=0.05, verbose=False, return_history=True)
    bound_dark, bound_star, hist_d, hist_s = res
    assert bound_star.sum() == 0
    assert len(hist_d) == len(hist_s) >= 1
    assert hist_d[0].dtype == bool and hist_d[0].shape == (395,)


def test_unbinding_reference_tree_names_run_exact(bound_cluster):
    """'tree'/'tree_gpu' map to the exact direct sum (no pyfalcon/CUDA)."""
    from nbody_streams_tpu.utils import iterative_unbinding

    pos, vel, mass = bound_cluster
    (a,), _, _ = iterative_unbinding(pos, vel, mass,
                                     potential_compute_method="tree",
                                     softening=0.05, verbose=False,
                                     theta=0.4)
    (b,), _, _ = iterative_unbinding(pos, vel, mass,
                                     potential_compute_method="direct",
                                     softening=0.05, verbose=False)
    np.testing.assert_array_equal(a, b)


def test_unbinding_native_form_unchanged(bound_cluster):
    from nbody_streams_tpu.utils import iterative_unbinding

    pos, vel, mass = bound_cluster
    mask, info = iterative_unbinding(pos, vel, mass, softening=0.05)
    assert mask.dtype == bool
    assert {"iterations", "removed_per_iter",
            "bound_fraction"} <= set(info)


def test_compute_iterative_boundness_deprecated(bound_cluster):
    from nbody_streams_tpu.utils import compute_iterative_boundness

    pos, vel, mass = bound_cluster
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        res, cp, cv = compute_iterative_boundness(
            pos, vel, mass, potential_compute_method="direct",
            softening=0.05, verbose=False)
    assert any(issubclass(w.category, DeprecationWarning) for w in rec)
    assert res[0][:5].sum() == 0


def test_unbinding_bfe_solver(bound_cluster):
    from nbody_streams_tpu.utils import iterative_unbinding

    pos, vel, mass = bound_cluster
    (bound,), _, _ = iterative_unbinding(
        pos, vel, mass, potential_compute_method="bfe", lmax=2,
        softening=0.05, verbose=False)
    assert bound[:5].sum() == 0


def test_unbinding_unknown_solver_raises(bound_cluster):
    from nbody_streams_tpu.utils import iterative_unbinding

    pos, vel, mass = bound_cluster
    with pytest.raises(ValueError, match="potential_compute_method"):
        iterative_unbinding(pos, vel, mass,
                            potential_compute_method="fmm")


# ---------------------------------------------------------------------------
# utils reference call forms (profiles, fits, grids, centering)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def plummer_cloud(rng):
    """~Plummer-distributed particles (M=1e10, b=2) via inverse CDF."""
    n = 40000
    u = rng.uniform(0.001, 0.999, n)
    r = 2.0 / np.sqrt(u ** (-2.0 / 3.0) - 1.0)
    pos = r[:, None] * uniform_dirs(rng, n)
    mass = np.full(n, 1e10 / n)
    return pos, mass


def uniform_dirs(rng, n):
    v = rng.normal(size=(n, 3))
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def test_empirical_profiles_reference_form(plummer_cloud):
    from nbody_streams_tpu.utils import (
        empirical_density_profile, empirical_circular_velocity_profile,
        empirical_velocity_dispersion_profile,
        empirical_velocity_rms_profile,
        empirical_velocity_anisotropy_profile)

    pos, mass = plummer_cloud
    # reference 2-tuple contract, selected by nbins=/rmin=/rmax=
    r, rho = empirical_density_profile(pos, mass, nbins=30, rmin=0.2,
                                       rmax=15.0)
    assert r.shape == rho.shape == (30,)
    assert r[0] < 0.2                 # arithmetic centres on 0-start grid
    # matches the analytic Plummer density mid-profile
    b = 2.0
    rho_true = 3e10 / (4 * np.pi * b**3) * (1 + (r / b) ** 2) ** -2.5
    mid = (r > 1.0) & (r < 6.0)
    np.testing.assert_allclose(rho[mid], rho_true[mid], rtol=0.25)
    # int third positional = nbins (reference positional layout)
    r2, rho2 = empirical_density_profile(pos, mass, 30, rmin=0.2,
                                         rmax=15.0)
    np.testing.assert_array_equal(r, r2)
    # native 3-tuple contract unchanged
    out = empirical_density_profile(pos, mass, bins=25)
    assert len(out) == 3
    # circular velocity: v_c(b) for Plummer = sqrt(G M b^2/(b^2+b^2)^1.5)
    rv, vc = empirical_circular_velocity_profile(pos, mass, nbins=40,
                                                 rmin=0.2, rmax=15.0)
    from nbody_streams_tpu import G_DEFAULT
    vc_true = np.sqrt(G_DEFAULT * 1e10 * rv**2
                      / (rv**2 + b**2) ** 1.5)
    sel = (rv > 1.0) & (rv < 8.0)
    np.testing.assert_allclose(vc[sel], vc_true[sel], rtol=0.05)
    # velocity profiles: reference statistic = std / rms of |v|
    vel = np.tile([1.0, 2.0, 2.0], (len(pos), 1))      # |v| = 3 exactly
    rr, disp = empirical_velocity_dispersion_profile(pos, vel, nbins=10,
                                                     rmin=0.5, rmax=10.0)
    good = ~np.isnan(disp)
    np.testing.assert_allclose(disp[good], 0.0, atol=1e-10)
    rr, rms = empirical_velocity_rms_profile(pos, vel, nbins=10,
                                             rmin=0.5, rmax=10.0)
    np.testing.assert_allclose(rms[~np.isnan(rms)], 3.0, rtol=1e-12)


def test_anisotropy_reference_form(rng, plummer_cloud):
    from nbody_streams_tpu.utils import (
        empirical_velocity_anisotropy_profile)

    pos, mass = plummer_cloud
    # purely radial orbits -> beta = 1; purely tangential -> beta < 0
    rhat = pos / np.linalg.norm(pos, axis=1, keepdims=True)
    vel_rad = 100.0 * rhat * rng.choice([-1, 1], len(pos))[:, None]
    r, beta = empirical_velocity_anisotropy_profile(
        pos, vel_rad, mass, nbins=12, rmin=0.5)
    good = ~np.isnan(beta)
    assert good.any()
    np.testing.assert_allclose(beta[good], 1.0, atol=1e-6)
    # native form still works (center third positional is (3,))
    r_n, beta_n = empirical_velocity_anisotropy_profile(
        pos, vel_rad, np.zeros(3), bins=10)
    assert np.nanmax(np.abs(beta_n - 1.0)) < 0.2


def test_double_power_law_factory():
    from nbody_streams_tpu.utils import double_power_law_density
    from scipy.integrate import quad

    # reference factory form: normalised to total mass
    rho = double_power_law_density(1e11, 5.0, 1.0, 4.0, 1.0)
    # beta=4 tail converges as 1/R: integrating to 5e3 misses ~0.2%
    total, _ = quad(lambda r: 4 * np.pi * r**2 * rho(r), 0, 5000.0,
                    limit=200)
    np.testing.assert_allclose(total, 1e11, rtol=5e-3)
    # beta <= 3 without rcut is non-normalisable
    with pytest.raises(ValueError, match="rcut"):
        double_power_law_density(1e11, 5.0, 1.0, 2.5, 1.0)
    # with rcut it normalises including the cutoff
    rho_c = double_power_law_density(1e11, 5.0, 1.0, 2.5, 1.0,
                                     rcut=50.0, cutoffstrength=2.0)
    total_c, _ = quad(lambda r: 4 * np.pi * r**2 * rho_c(r), 0, 400.0,
                      limit=200)
    np.testing.assert_allclose(total_c, 1e11, rtol=1e-3)
    # native 6-arg evaluator form unchanged
    v = double_power_law_density(5.0, 2.0, 5.0, 1.0, 4.0, 1.0)
    assert np.isscalar(v) or np.ndim(v) == 0


def test_fit_profiles_reference_particle_forms(plummer_cloud):
    from nbody_streams_tpu.utils import (fit_plummer_profile,
                                         fit_dehnen_profile,
                                         fit_double_spheroid_profile)

    pos, mass = plummer_cloud
    M, bfit, r_c, rho_v = fit_plummer_profile(pos, mass, bins=30)
    np.testing.assert_allclose(M, 1e10, rtol=0.1)
    np.testing.assert_allclose(bfit, 2.0, rtol=0.1)
    assert r_c.shape == rho_v.shape
    out = fit_dehnen_profile(pos, mass, bins=40)
    assert len(out) == 5              # (M, a, gamma, r_centers, rho_vals)
    # reference-form spheroid fit from particles
    params = fit_double_spheroid_profile(pos=pos, mass=mass, bins=25)
    M_s, a_s, alpha_s, beta_s, gamma_s = params
    np.testing.assert_allclose(M_s, 1e10, rtol=0.25)
    assert 0.0 <= gamma_s < 2.0       # Plummer: shallow inner slope
    assert beta_s > 3.0               # steep outer slope
    # return_profiles contract
    params2, profiles = fit_double_spheroid_profile(
        pos=pos, mass=mass, bins=25, return_profiles=True)
    assert len(profiles) == 4
    # native (r, rho) form unchanged
    vals, errs = fit_plummer_profile(r_c[rho_v > 0], rho_v[rho_v > 0])
    assert set(vals) == {"mass", "scaleRadius"}


def test_find_center_reference_layout(rng):
    from nbody_streams_tpu.utils import find_center, find_center_position

    pos = rng.normal(0, 0.3, (3000, 3)) + np.array([5.0, -2.0, 1.0])
    mass = np.full(3000, 1.0)
    vel = rng.normal(0, 1.0, (3000, 3)) + np.array([10.0, 0.0, 0.0])
    # reference positional layout: (pos, mass)
    c = find_center(pos, mass, method="shrinking_sphere")
    np.testing.assert_allclose(c, [5.0, -2.0, 1.0], atol=0.1)
    # return_velocity=True with vel=
    c2, v2 = find_center(pos, mass, vel=vel, method="shrinking_sphere",
                         return_velocity=True, vel_aperture=1.0)
    np.testing.assert_allclose(v2[0], 10.0, atol=0.3)
    # return_velocity=False suppresses the tuple even with vel given
    c3 = find_center(pos, vel=vel, method="shrinking_sphere",
                     return_velocity=False)
    assert np.shape(c3) == (3,)
    # method='kde' (reference method set)
    c4 = find_center(pos, mass, method="kde")
    np.testing.assert_allclose(c4, [5.0, -2.0, 1.0], atol=0.2)
    # deprecated positional alias (pos, mass, method)
    with pytest.warns(DeprecationWarning):
        c5 = find_center_position(pos, mass, "shrinking_sphere")
    np.testing.assert_allclose(c5, c, atol=1e-12)


def test_fit_iterative_ellipsoid_reference_form(rng):
    from nbody_streams_tpu.utils import fit_iterative_ellipsoid

    # triaxial Gaussian blob, axis ratios 1 : 0.6 : 0.3
    n = 20000
    pos = rng.normal(size=(n, 3)) * np.array([1.0, 0.6, 0.3])
    abc, T = fit_iterative_ellipsoid(pos, Rmax=3.0,
                                     reduced_structure=False,
                                     orient_with_momentum=False)
    assert abc.shape == (3,) and T.shape == (3, 3)
    assert abc[0] == 1.0
    np.testing.assert_allclose(abc[1], 0.6, atol=0.1)
    np.testing.assert_allclose(abc[2], 0.3, atol=0.1)
    # rows are orthonormal
    np.testing.assert_allclose(T @ T.T, np.eye(3), atol=1e-8)
    # return_ellip_triax contract
    abc2, T2, ellip, triax = fit_iterative_ellipsoid(
        pos, Rmax=3.0, reduced_structure=False,
        orient_with_momentum=False, return_ellip_triax=True)
    np.testing.assert_allclose(ellip, 1.0 - abc2[2], rtol=1e-12)
    # momentum orientation: minor axis along L for a thin rotating disk
    disk = rng.normal(size=(n, 3)) * np.array([1.0, 1.0, 0.05])
    vphi = np.column_stack([-disk[:, 1], disk[:, 0],
                            np.zeros(n)]) * 10.0
    abc3, T3 = fit_iterative_ellipsoid(disk, None, vphi, 0.0, 4.0)
    np.testing.assert_allclose(np.abs(T3[2]), [0, 0, 1], atol=0.05)
    # native dict contract unchanged
    out = fit_iterative_ellipsoid(pos, r_max=3.0, reduced=False)
    assert isinstance(out, dict) and "b_over_a" in out


# ---------------------------------------------------------------------------
# io / fire / coefs / spray / reader reference call forms
# ---------------------------------------------------------------------------

def test_coefs_methods_reference_contracts(quad_coefs):
    # zeroed: bare-int l shorthand + auto negative-m (reference
    # _coefs.py:213); include_negative=False gives exact pairs
    z_int = quad_coefs.zeroed([0, 2])
    np.testing.assert_allclose(z_int.phi, quad_coefs.phi)
    z_pair = quad_coefs.zeroed([(2, 1)])
    kept = [i for i, lm in enumerate(quad_coefs.lm_labels)
            if tuple(lm) in {(2, 1), (2, -1)}]
    dropped = [i for i in range(len(quad_coefs.lm_labels))
               if i not in kept]
    assert (z_pair.phi[:, kept] != 0).any()
    assert (z_pair.phi[:, dropped] == 0).all()
    z_exact = quad_coefs.zeroed([(2, 1)], include_negative=False)
    i_neg = quad_coefs.lm_labels.index((2, -1))
    assert (z_exact.phi[:, i_neg] == 0).all()
    # total_power(l) -> float (reference); total_power() -> native dict
    tp = quad_coefs.total_power(2)
    assert isinstance(tp, float) and tp > 0
    assert isinstance(quad_coefs.total_power(), dict)
    # radial_power use_quadrature=False -> sum |phi|
    rp2 = quad_coefs.radial_power(2, use_quadrature=False)
    np.testing.assert_allclose(
        rp2, np.abs(quad_coefs.phi[:, [1, 2, 3]]).sum(axis=1))


def test_write_snapshot_coefs_reference_batch_form(tmp_path, mult_coefs):
    # lay out per-snapshot coefficient files
    for s in (90, 91, 92):
        (tmp_path / f"{s:03d}.coef_mult").write_text(
            mult_coefs.to_coef_string())
    out = tmp_path / "arch_mult.h5"
    P.write_snapshot_coefs_to_h5(
        snapshot_ids=range(90, 93),
        coef_file_patterns=[str(tmp_path / "{snap:03d}.coef_mult")],
        h5_output_paths=[out],
        times=[0.0, 0.5, 1.0])
    pot = P.load_agama_evolving_potential(out,
                                          group_names=["snap_091"],
                                          times=[0.5])
    xyz = np.array([3.0, 0.0, 4.0])
    ref = P.load_potential(mult_coefs)
    np.testing.assert_allclose(float(pot.potential(xyz, t=0.5)),
                               float(ref.potential(xyz)), rtol=1e-6)
    # positional reference layout works too
    out2 = tmp_path / "arch2.h5"
    P.write_snapshot_coefs_to_h5(
        range(90, 93), [str(tmp_path / "{snap:03d}.coef_mult")], [out2])
    assert out2.exists()
    with pytest.raises(FileNotFoundError):
        P.write_snapshot_coefs_to_h5(
            snapshot_ids=[1], coef_file_patterns=["{snap}.nope"],
            h5_output_paths=[tmp_path / "x.h5"])


@pytest.fixture()
def fire_dir(tmp_path, mult_coefs):
    """Minimal FIRE-layout directory with snapshot_times + coef files."""
    (tmp_path / "snapshot_times.txt").write_text(
        "# snap scale-factor redshift time[Gyr] time_width[Myr]\n"
        "90 0.9 0.11 12.0 25.0\n"
        "91 0.95 0.05 12.5 25.0\n"
        "92 1.0 0.0 13.0 25.0\n")
    pot_dir = tmp_path / "potential" / "10kpc"
    pot_dir.mkdir(parents=True)
    for s in (90, 91, 92):
        (pot_dir / f"{s}.dark.none_4.coef_mul_spl").write_text(
            mult_coefs.to_coef_string())
    return tmp_path


def test_read_snapshot_times_reference_form(fire_dir):
    # directory argument + pandas-style column names + sep= ignored
    df = P.read_snapshot_times(fire_dir, sep=r"\s+")
    np.testing.assert_array_equal(df["snap"], [90, 91, 92])
    np.testing.assert_allclose(df["time[Gyr]"], [12.0, 12.5, 13.0])
    np.testing.assert_allclose(df["time_width[Myr]"], [25.0] * 3)


def test_create_fire_evolving_ini_reference_form(fire_dir, capsys):
    out = P.create_fire_evolving_ini(
        fire_dir, "*.dark.none_4.coef_mul_spl", "evolv.ini",
        snap_range=(90, 91), verbose=True)
    assert isinstance(out, str)
    assert out.endswith("evolv.ini")
    text = Path(out).read_text()
    assert "90.dark.none_4.coef_mul_spl" in text
    assert "92.dark" not in text                # snap_range respected
    assert "12.5" in text                        # times from the listing
    assert "Written:" in capsys.readouterr().out
    with pytest.raises(FileNotFoundError, match="Missing"):
        P.create_fire_evolving_ini(fire_dir, "*.absent", "x.ini")


def test_create_evolving_ini_reference_order(tmp_path):
    # reference positional order: (times, coef_paths, output_path)
    ini = tmp_path / "ref_order.ini"
    out = P.create_evolving_ini([0.0, 1.0], ["a.coef", "b.coef"], ini)
    assert out == ini and "a.coef" in ini.read_text()
    # reference keyword names
    ini2 = tmp_path / "kw.ini"
    P.create_evolving_ini(times=[0.0], coef_paths=["c.coef"],
                          output_path=ini2)
    assert "c.coef" in ini2.read_text()


def test_spray_R_keyword(rng):
    from nbody_streams_tpu.fast_sims import (
        create_ic_particle_spray_chen2025,
        create_ic_particle_spray_fardal2015)

    n = 16
    orbit = np.hstack([rng.normal(0, 20, (n, 3)),
                       rng.normal(0, 100, (n, 3))])
    rj = np.full(n, 2.0)
    rots = np.tile(np.eye(3), (n, 1, 1))
    a = create_ic_particle_spray_chen2025(orbit, 1e9, rj, rots, seed=1)
    b = create_ic_particle_spray_chen2025(orbit, 1e9, rj, R=rots,
                                          G=None, seed=1)
    np.testing.assert_array_equal(a, b)
    vj = np.full(n, 5.0)
    c = create_ic_particle_spray_fardal2015(orbit, rj, vj, rots, seed=2)
    d = create_ic_particle_spray_fardal2015(orbit, rj, vj, R=rots, seed=2)
    np.testing.assert_array_equal(c, d)
    with pytest.raises(TypeError, match="not both"):
        create_ic_particle_spray_fardal2015(orbit, rj, vj, rots, R=rots)


def test_run_nbody_cpu_reference_kwargs(tmp_path):
    """The reference's CPU-only knobs (method/theta/nthreads,
    reference run.py run_nbody_cpu) are accepted and validated."""
    import nbody_streams_tpu as nst

    xv, m = nst.make_plummer_sphere(128, M_total=1e8, a=0.5, seed=1)
    out = nst.run_nbody_cpu(xv, m, 0.0, 2e-4, 1e-4, softening=0.05,
                            method="tree", theta=0.5, nthreads=4,
                            save_snapshots=False, verbose=False)
    assert np.asarray(out).shape == (128, 6)
    with pytest.raises(ValueError, match="unknown method"):
        nst.run_nbody_cpu(xv, m, 0.0, 2e-4, 1e-4, method="fmm")


def test_extract_orbits_reference_contract(tmp_path):
    from nbody_streams_tpu import Species, run_simulation, ParticleReader

    xv = np.random.default_rng(0).normal(0, 1, (64, 6))
    sp = [Species(name="dark", N=40, mass=1e6),
          Species(name="star", N=24, mass=1e5)]
    run_simulation(xv, sp, 0.0, 2e-4, 1e-4, output_dir=tmp_path,
                   save_snapshots=True, snapshots=2, verbose=False,
                   architecture="cpu")
    reader = ParticleReader(str(tmp_path / "snapshot.h5"))
    orb = reader.extract_orbits("star", min_parallel_workers=1)
    assert orb.species["star"] is orb.posvel    # reference attrs
    assert orb.star is orb.posvel
    assert orb.Times is orb.times
    both = reader.extract_orbits("all")
    assert set(both.species) == {"dark", "star"}
    assert both.dark.shape[1] == 40 and both.star.shape[1] == 24
    assert reader.extract_orbits(False) is None


# ---------------------------------------------------------------------------
# coords reference call forms
# ---------------------------------------------------------------------------

def test_convert_coords_data_kwarg(rng):
    from nbody_streams_tpu.coords import convert_coords

    pts = rng.normal(0, 5, (20, 3))
    a = convert_coords(pts, "cart", "sph")
    b = convert_coords(data=pts, from_sys="cart", to_sys="sph")
    np.testing.assert_array_equal(a, b)
    with pytest.raises(TypeError, match="not both"):
        convert_coords(pts, "cart", "sph", data=pts)


def test_convert_vectors_reference_contract(rng):
    """Positional call = reference form (pos, vec, from, to) ->
    (pos_new, vec_new) (reference coords/transforms.py:265)."""
    from nbody_streams_tpu.coords import convert_coords, convert_vectors

    pos = rng.normal(0, 5, (40, 3))
    r = np.linalg.norm(pos, axis=1, keepdims=True)
    vel = 7.0 * pos / r                     # purely radial
    pos_sph, v_sph = convert_vectors(pos, vel, "cart", "sph")
    np.testing.assert_allclose(pos_sph,
                               convert_coords(pos, "cart", "sph"),
                               atol=1e-12)
    np.testing.assert_allclose(v_sph[:, 0], 7.0, atol=1e-10)
    np.testing.assert_allclose(v_sph[:, 1:], 0.0, atol=1e-10)
    # round trip through the reference form
    pos_back, v_back = convert_vectors(pos_sph, v_sph, "sph", "cart")
    np.testing.assert_allclose(pos_back, pos, atol=1e-10)
    np.testing.assert_allclose(v_back, vel, atol=1e-10)


def test_convert_to_vel_los_reference_form(rng):
    from nbody_streams_tpu.coords import convert_to_vel_los

    # (6,) -> scalar; v_los of a tangential orbit is 0
    assert convert_to_vel_los(
        np.array([8.0, 0.0, 0.0, 0.0, 220.0, 0.0])) == pytest.approx(0.0)
    # (N, 6) batch + broadcastable reference subtraction
    xv = rng.normal(0, 1, (5, 100, 6))
    ref = rng.normal(0, 1, (5, 1, 6))
    v = convert_to_vel_los(xv, ref)
    assert v.shape == (5, 100)
    d = xv - ref
    expect = np.sum(d[..., :3] * d[..., 3:], -1) \
        / np.linalg.norm(d[..., :3], axis=-1)
    np.testing.assert_allclose(v, expect, rtol=1e-12)


def test_to_stream_coords_reference_contract():
    from nbody_streams_tpu.coords import (generate_stream_coords,
                                          to_stream_coords)

    ang = np.linspace(-0.4, 0.4, 40)
    pos = 15.0 * np.column_stack([np.cos(ang), np.sin(ang), 0 * ang])
    vel = 120.0 * np.column_stack([-np.sin(ang), np.cos(ang), 0 * ang])
    xv = np.hstack([pos, vel])
    phi1, phi2, R = generate_stream_coords(xv, xv[20],
                                           return_rotation=True)
    # R columns are unit basis vectors (reference convention)
    np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-10)
    p1, p2 = to_stream_coords(xv, R)
    np.testing.assert_allclose(p1, phi1, atol=1e-10)
    # rotation= is the native keyword alias
    p1b, _ = to_stream_coords(xv, rotation=R)
    np.testing.assert_array_equal(p1, p1b)
    # proper motions: circular orbit in the stream plane ->
    # mu_phi2 = 0 and mu_phi1*cos(phi2) = v/r (in km/s/kpc)
    p1, p2, mu1, mu2 = to_stream_coords(xv, R,
                                        return_proper_motions=True,
                                        mas_yr=False)
    np.testing.assert_allclose(mu2, 0.0, atol=1e-10)
    np.testing.assert_allclose(np.abs(mu1), 120.0 / 15.0, rtol=1e-10)
    # mas/yr conversion = / 4.740470446
    *_, mu1_mas, _ = to_stream_coords(xv, R, return_proper_motions=True,
                                      mas_yr=True)
    np.testing.assert_allclose(mu1_mas, mu1 / 4.740470446, rtol=1e-12)
    # positions-only input refuses proper motions
    with pytest.raises(ValueError, match="6-column"):
        to_stream_coords(pos, R, return_proper_motions=True)


def test_get_observed_stream_coords_reference_form():
    from nbody_streams_tpu.coords import get_observed_stream_coords

    d_sun, z_sun = 8.122, 0.0208
    # anchor 1: particles at the Galactic centre appear toward the GC's
    # ICRS direction (ra 266.4051, dec -28.936175)
    ang = np.linspace(-0.2, 0.2, 20)
    tiny = 1e-6 * np.column_stack([np.cos(ang), np.sin(ang), 0 * ang])
    xv_gc = np.hstack([tiny, 100.0 * np.column_stack(
        [-np.sin(ang), np.cos(ang), 0 * ang])])
    ra, dec, v_los, phi1, phi2 = get_observed_stream_coords(
        xv_gc, xv_gc[10], galcen_distance=d_sun, z_sun=z_sun)
    np.testing.assert_allclose(ra, 266.4051, atol=1e-3)
    np.testing.assert_allclose(dec, -28.936175, atol=1e-3)
    assert phi1.shape == (20,)
    # anchor 2: a point toward the heliocentric-galactic z-axis looks at
    # the North Galactic Pole (ICRS ra 192.859, dec 27.128).  The
    # galactocentric frame is tilted by asin(z_sun/d) w.r.t. the
    # heliocentric galactic frame, so the test point carries that tilt.
    x_sun = -np.sqrt(d_sun**2 - z_sun**2)
    th = np.arcsin(z_sun / d_sun)
    L = 1e7
    far = np.array([[x_sun + L * np.sin(th), 0.0,
                     z_sun + L * np.cos(th), 0.0, 0.0, 0.0]])
    ra2, dec2, *_ = get_observed_stream_coords(
        far, far[0] + [0, 0, 0, 0, 1.0, 0], galcen_distance=d_sun,
        z_sun=z_sun)
    np.testing.assert_allclose(ra2, 192.859, atol=0.01)
    np.testing.assert_allclose(dec2, 27.128, atol=0.01)
    # anchor 3: co-moving with the Sun at the GC -> v_los ~ -|v_sun
    # projected| ... use a particle moving WITH the solar velocity: the
    # relative velocity is zero, so v_los = 0 exactly
    v_sun = (12.9, 245.6, 7.78)
    xv_rest = np.vstack([xv_gc[:, :3].T, *np.broadcast_to(
        np.array(v_sun)[:, None], (3, 20))]).T
    _, _, v0, _, _ = get_observed_stream_coords(
        xv_rest, xv_rest[10], galcen_v_sun=v_sun)
    np.testing.assert_allclose(v0, 0.0, atol=1e-9)
    # native dict form unchanged
    out = get_observed_stream_coords(xv_gc, xv_gc[10])
    assert isinstance(out, dict) and "pm_phi1" in out


# ---------------------------------------------------------------------------
# viz reference call forms
# ---------------------------------------------------------------------------

def test_render_surface_density_reference_form(rng):
    from nbody_streams_tpu.viz import render_surface_density

    n = 3000
    x = rng.normal(0, 20, n).astype(np.float32)
    y = rng.normal(0, 20, n).astype(np.float32)
    m = np.ones(n, np.float32)
    grid, bounds = render_surface_density(x, y, m, resolution=64,
                                          gridsize=120.0,
                                          chunk_size=10_000_000,
                                          sort_by_morton=True,
                                          verbose=True)
    assert grid.shape == (64, 64)
    assert bounds == (-60.0, 60.0, -60.0, 60.0)
    # reference layout is [ix, iy]: the native form returns the
    # transpose of the same splat
    img, ext = render_surface_density(
        np.column_stack([x, y]), m, extent=(-60, 60, -60, 60), npix=64,
        n_neighbors=31)
    np.testing.assert_allclose(grid, img.T, rtol=1e-5, atol=1e-5)
    assert ext == bounds
    # total mass conserved on the grid (everything inside bounds)
    inside = (np.abs(x) < 55) & (np.abs(y) < 55)
    pix_area = (120.0 / 64) ** 2
    assert grid.sum() * pix_area >= inside.sum() * 0.9


def test_render_surface_density_ref_form_needs_mass(rng):
    from nbody_streams_tpu.viz import render_surface_density

    x = rng.normal(0, 1, 10)
    with pytest.raises(TypeError, match="third argument"):
        render_surface_density(x, x)
    with pytest.raises(TypeError, match="unexpected kwargs"):
        render_surface_density(x, x, np.ones(10), bogus=1)


def test_get_smoothing_lengths_k_neighbors_alias(rng):
    from nbody_streams_tpu.viz import get_smoothing_lengths

    pos = rng.normal(0, 1, (500, 2))
    h_ref = get_smoothing_lengths(pos, k_neighbors=16,
                                  safety_factor=0.6,
                                  gpu_vram_threshold_gb=10.0,
                                  verbose=True)
    h_nat = get_smoothing_lengths(pos, n_neighbors=15)
    np.testing.assert_array_equal(h_ref, h_nat)


def test_plot_density_reference_kwargs(rng):
    from nbody_streams_tpu.viz import plot_density

    pos = rng.normal(0, 20, (2000, 3))
    ax, img = plot_density(pos=pos, gridsize=100.0, resolution=32,
                           xval="x", yval="z", method="histogram",
                           scale_size=10.0, return_dens=True)
    assert img.shape == (32, 32)
    # volume density divides by the slab thickness
    _, img_s = plot_density(pos=pos, gridsize=100.0, resolution=32,
                            xval="x", yval="y", method="histogram",
                            slice_width=5.0, density_kind="surface")
    _, img_v = plot_density(pos=pos, gridsize=100.0, resolution=32,
                            xval="x", yval="y", method="histogram",
                            slice_width=5.0, density_kind="volume")
    np.testing.assert_allclose(img_v, img_s / 10.0, rtol=1e-12)
    with pytest.raises(ValueError, match="slice_width"):
        plot_density(pos=pos, density_kind="volume", method="histogram")
    with pytest.raises(ValueError, match="projected axis"):
        plot_density(pos=pos, xval="x", yval="y", slice_axis="x",
                     slice_width=1.0, method="histogram")


def test_plot_density_snap_extraction(rng):
    from nbody_streams_tpu.viz import plot_density

    n = 500
    posvel = rng.normal(0, 10, (n, 6))
    snap = types.SimpleNamespace(
        species={"gas": {"posvel": posvel, "mass": np.ones(n)}},
        dark={"posvel": posvel, "mass": np.full(n, 2.0)})
    ax, img = plot_density(snap=snap, spec="gas", resolution=16,
                           method="histogram")
    assert img.shape == (16, 16)
    ax, img2 = plot_density(snap=snap, spec="dark", resolution=16,
                            method="histogram")
    np.testing.assert_allclose(img2, 2.0 * img, rtol=1e-12)
    with pytest.raises(ValueError, match="no species"):
        plot_density(snap=snap, spec="star", method="histogram")
    with pytest.raises(ValueError, match="not both"):
        plot_density(pos=posvel[:, :3], snap=snap, method="histogram")
