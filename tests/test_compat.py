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
    oracle_without = P.load_potential(quad_coefs.zeroed([(0, 0), (2, 1)]))
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
