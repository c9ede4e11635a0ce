"""utils (profiles/fits/shape/center/unbinding), coords, viz."""
import numpy as np
import pytest

from nbody_streams_tpu import G_DEFAULT, make_plummer_sphere
from nbody_streams_tpu.coords import (
    convert_coords,
    convert_to_vel_los,
    convert_vectors,
    generate_stream_coords,
    get_observed_stream_coords,
    to_stream_coords,
)
from nbody_streams_tpu.utils.main import (
    empirical_circular_velocity_profile,
    empirical_density_profile,
    empirical_velocity_anisotropy_profile,
    empirical_velocity_dispersion_profile,
    fibonacci_sphere_grid,
    find_center,
    fit_dehnen_profile,
    fit_iterative_ellipsoid,
    fit_plummer_profile,
    iterative_unbinding,
    make_uneven_grid,
)
from nbody_streams_tpu.viz import (
    plot_density,
    plot_mollweide,
    plot_stream_sky,
    render_surface_density,
    get_smoothing_lengths,
)


@pytest.fixture(scope="module")
def plummer():
    xv, m = make_plummer_sphere(20000, M_total=1e8, a=0.5, seed=7)
    return xv, m


# ---------------------------------------------------------------------------
# utils
# ---------------------------------------------------------------------------

def test_density_profile_matches_plummer(plummer):
    xv, m = plummer
    r, rho, counts = empirical_density_profile(xv[:, :3], m, bins=25,
                                               r_min=0.05, r_max=5.0)
    expected = 3e8 / (4 * np.pi * 0.5**3) * (1 + (r / 0.5) ** 2) ** -2.5
    sel = counts > 200
    np.testing.assert_allclose(rho[sel], expected[sel], rtol=0.25)


def test_vcirc_profile(plummer):
    xv, m = plummer
    r, vc = empirical_circular_velocity_profile(xv[:, :3], m, bins=20,
                                                r_min=0.1, r_max=5.0)
    expected = np.sqrt(G_DEFAULT * 1e8 * r**2 / (r**2 + 0.25) ** 1.5)
    np.testing.assert_allclose(vc, expected, rtol=0.1)


def test_dispersion_and_anisotropy(plummer):
    xv, m = plummer
    r, sig = empirical_velocity_dispersion_profile(
        xv[:, :3], xv[:, 3:], bins=12, r_min=0.1, r_max=3.0)
    assert np.nanmax(sig) > 0
    r, beta = empirical_velocity_anisotropy_profile(
        xv[:, :3], xv[:, 3:], bins=12, r_min=0.1, r_max=3.0)
    # isotropic Plummer: beta ~ 0
    assert np.abs(np.nanmedian(beta)) < 0.15


def test_profile_fits(plummer):
    xv, m = plummer
    r, rho, counts = empirical_density_profile(xv[:, :3], m, bins=30,
                                               r_min=0.05, r_max=8.0)
    sel = counts > 50
    vals, errs = fit_plummer_profile(r[sel], rho[sel])
    np.testing.assert_allclose(vals["mass"], 1e8, rtol=0.2)
    np.testing.assert_allclose(vals["scaleRadius"], 0.5, rtol=0.2)
    vals2, _ = fit_dehnen_profile(r[sel], rho[sel])
    assert vals2["gamma"] < 1.0  # Plummer is cored


def test_ellipsoid_shape(rng):
    n = 20000
    x = rng.normal(0, 1.0, n)
    y = rng.normal(0, 0.6, n)
    z = rng.normal(0, 0.3, n)
    res = fit_iterative_ellipsoid(np.column_stack([x, y, z]),
                                  reduced=False, r_max=5.0)
    np.testing.assert_allclose(res["b_over_a"], 0.6, atol=0.07)
    np.testing.assert_allclose(res["c_over_a"], 0.3, atol=0.07)


def test_find_center_density_peak(plummer):
    xv, m = plummer
    shift = np.array([5.0, -2.0, 1.0])
    c = find_center(xv[:, :3] + shift, mass=m, method="density_peak",
                    potential_solver="bfe")
    assert np.linalg.norm(c - shift) < 0.2
    c2, v2 = find_center(xv[:, :3] + shift, vel=xv[:, 3:], mass=m,
                         method="shrinking_sphere")
    assert np.linalg.norm(c2 - shift) < 0.3


def test_iterative_unbinding(plummer):
    xv, m = plummer
    # contaminate with fast unbound interlopers
    n_out = 500
    rng = np.random.default_rng(0)
    out_pos = rng.normal(0, 2.0, (n_out, 3))
    out_vel = rng.normal(0, 500.0, (n_out, 3))  # way above v_esc
    pos = np.vstack([xv[:, :3], out_pos])
    vel = np.vstack([xv[:, 3:], out_vel])
    mass = np.concatenate([m, np.full(n_out, m[0])])
    bound, info = iterative_unbinding(pos, vel, mass, solver="bfe")
    frac_interlopers = bound[-n_out:].mean()
    assert frac_interlopers < 0.05          # interlopers removed
    assert bound[:-n_out].mean() > 0.8      # cluster mostly kept
    # direct solver agrees on a subsample
    bound_d, _ = iterative_unbinding(pos[::20], vel[::20], mass[::20],
                                     solver="direct")
    assert bound_d[-n_out // 20:].mean() < 0.1


def test_grids():
    # reference contract (reference utils/main.py:107-164): node 0 at 0,
    # node 1 at xmin, last node at xmax, geometric growth
    g = make_uneven_grid(0.1, 100.0, 20)
    assert g.shape == (20,)
    assert g[0] == 0.0
    assert g[1] == pytest.approx(0.1, rel=1e-9)
    assert g[-1] == pytest.approx(100.0, rel=1e-9)
    assert np.all(np.diff(np.diff(g)) > 0)     # growing spacing
    # xmax=None -> uniform spacing xmin; infeasible grading -> uniform
    np.testing.assert_allclose(make_uneven_grid(0.5, nbins=4),
                               [0.0, 0.5, 1.0, 1.5])
    np.testing.assert_allclose(make_uneven_grid(1.0, 2.5, nbins=4),
                               np.linspace(0, 2.5, 4))
    pts = fibonacci_sphere_grid(500)
    np.testing.assert_allclose(np.linalg.norm(pts, axis=1), 1.0,
                               rtol=1e-12)
    # near-uniform: mean position ~ 0
    assert np.abs(pts.mean(0)).max() < 0.01
    # radius / proj / jittered knobs (reference utils/main.py:1384)
    pts_r = fibonacci_sphere_grid(100, radius=3.0)
    np.testing.assert_allclose(np.linalg.norm(pts_r, axis=1), 3.0,
                               rtol=1e-12)
    sph = fibonacci_sphere_grid(100, radius=2.0, proj="sph")
    np.testing.assert_allclose(sph[:, 0], 2.0)
    assert np.all(sph[:, 1] >= 0) and np.all(sph[:, 1] <= np.pi)
    jit = fibonacci_sphere_grid(100, jittered=True, seed=1)
    assert not np.allclose(jit, fibonacci_sphere_grid(100))
    # uniform_spherical_grid: reference contract = random points on the
    # sphere SURFACE (utils/main.py:1327)
    from nbody_streams_tpu.utils import uniform_spherical_grid

    u = uniform_spherical_grid(400, radius=1.5, seed=3)
    assert u.shape == (400, 3)
    np.testing.assert_allclose(np.linalg.norm(u, axis=1), 1.5,
                               rtol=1e-12)
    cyl = uniform_spherical_grid(50, proj="cyl", seed=3)
    np.testing.assert_allclose(np.hypot(cyl[:, 0], 0) ** 2 + cyl[:, 2]**2,
                               1.0, rtol=1e-9)


# ---------------------------------------------------------------------------
# coords
# ---------------------------------------------------------------------------

def test_coord_roundtrips(rng):
    pts = rng.normal(0, 10, (100, 3))
    for sys in ("sph", "cyl"):
        out = convert_coords(convert_coords(pts, "cart", sys), sys, "cart")
        np.testing.assert_allclose(out, pts, atol=1e-10)
    # sph <-> cyl direct
    sph = convert_coords(pts, "cart", "sph")
    cyl = convert_coords(sph, "sph", "cyl")
    np.testing.assert_allclose(cyl, convert_coords(pts, "cart", "cyl"),
                               atol=1e-10)


def test_coords_nan_propagation():
    pts = np.array([[1.0, 2.0, 3.0], [np.nan, 1.0, 1.0]])
    out = convert_coords(pts, "cart", "sph")
    assert np.isfinite(out[0]).all() and np.isnan(out[1]).all()


def test_vector_conversion_radial(rng):
    """A purely radial velocity maps to (v_r, 0, 0) in spherical."""
    pos = rng.normal(0, 5, (50, 3))
    r = np.linalg.norm(pos, axis=1, keepdims=True)
    vel = 42.0 * pos / r
    v_sph = convert_vectors(vectors=vel, positions=pos,
                            from_sys="cart", to_sys="sph")
    np.testing.assert_allclose(v_sph[:, 0], 42.0, atol=1e-10)
    np.testing.assert_allclose(v_sph[:, 1:], 0.0, atol=1e-10)
    # round trip
    back = convert_vectors(vectors=v_sph, positions=pos,
                           from_sys="sph", to_sys="cart")
    np.testing.assert_allclose(back, vel, atol=1e-10)


def test_vel_los():
    pos = np.array([[10.0, 0.0, 0.0]])
    vel = np.array([[-30.0, 40.0, 0.0]])
    assert convert_to_vel_los(pos, vel)[0] == pytest.approx(-30.0)


def test_stream_coords_planar_orbit():
    """Particles on a circle in the xy-plane: phi2 = 0, phi1 spans."""
    ang = np.linspace(-0.5, 0.5, 50)
    pos = 20.0 * np.column_stack([np.cos(ang), np.sin(ang), 0 * ang])
    vel = 100.0 * np.column_stack([-np.sin(ang), np.cos(ang), 0 * ang])
    xv = np.hstack([pos, vel])
    prog = xv[25]
    phi1, phi2, rot = generate_stream_coords(xv, prog,
                                             return_rotation=True)
    np.testing.assert_allclose(phi2, 0.0, atol=1e-8)
    assert phi1.max() - phi1.min() > 50.0  # degrees
    p1, p2 = to_stream_coords(xv, rot)
    np.testing.assert_allclose(p1, phi1, atol=1e-10)
    np.testing.assert_allclose(p2, phi2, atol=1e-10)


def test_observed_stream_coords():
    ang = np.linspace(-0.3, 0.3, 30)
    pos = 20.0 * np.column_stack([np.cos(ang), np.sin(ang), 0 * ang])
    vel = 100.0 * np.column_stack([-np.sin(ang), np.cos(ang), 0 * ang])
    xv = np.hstack([pos, vel])
    obs = get_observed_stream_coords(xv, xv[15],
                                     observer=[-8.2, 0, 0, 0, 0, 0])
    assert set(obs) >= {"phi1", "phi2", "dist", "v_los", "pm_phi1",
                        "pm_phi2"}
    np.testing.assert_allclose(obs["dist"][15],
                               np.linalg.norm(pos[15] - [-8.2, 0, 0]),
                               rtol=1e-12)


# ---------------------------------------------------------------------------
# viz
# ---------------------------------------------------------------------------

def test_render_surface_density_conserves_mass(plummer):
    xv, m = plummer
    img, extent = render_surface_density(xv[:, :3], m, npix=128,
                                         extent=(-4, 4, -4, 4))
    pix_area = (8.0 / 128) ** 2
    captured = img.sum() * pix_area
    # most of the Plummer mass lies within 4 kpc in projection
    assert 0.85 * 1e8 < captured <= 1.001e8
    assert img.shape == (128, 128) and (img >= 0).all()


def test_smoothing_lengths(plummer):
    xv, _ = plummer
    h = get_smoothing_lengths(xv[:500, :3], n_neighbors=16)
    assert h.shape == (500,) and (h > 0).all()


def test_plot_density_and_friends(plummer):
    import matplotlib

    matplotlib.use("Agg", force=True)
    import matplotlib.pyplot as plt

    xv, m = plummer
    ax, img = plot_density(xv[:2000, :3], m[:2000], method="histogram",
                           npix=64, scale_bar=1.0)
    assert img.shape == (64, 64)
    ax2, img2 = plot_mollweide(xv[:2000, :3])
    # HEALPix surface-density map: one value per pixel, finite everywhere
    from nbody_streams_tpu.viz.healpix import nside2npix
    assert img2.shape == (nside2npix(60),) and np.isfinite(img2).all()
    ang = np.linspace(-0.3, 0.3, 50)
    stream = np.hstack([
        20 * np.column_stack([np.cos(ang), np.sin(ang), 0 * ang]),
        100 * np.column_stack([-np.sin(ang), np.cos(ang), 0 * ang]),
    ])
    ax3, obs = plot_stream_sky(stream)
    assert len(obs["phi1"]) == 50
    plt.close("all")


def test_plot_stream_evolution(plummer):
    import matplotlib

    matplotlib.use("Agg", force=True)
    import matplotlib.pyplot as plt

    xv, m = plummer
    traj = np.stack([xv[:500], xv[:500] + 0.1, xv[:500] + 0.2])
    fig, axs = __import__(
        "nbody_streams_tpu.viz", fromlist=["plot_stream_evolution"]
    ).plot_stream_evolution(traj, np.array([0.0, 0.5, 1.0]), n_panels=3)
    assert len(axs) == 3
    plt.close("all")


def test_render_surface_density_rectangular_extent(plummer):
    """Non-square extents must map y with its own pixel scale
    (r2 review: y used the x pixel size, spilling particles from
    outside the window into the map)."""
    xv, m = plummer
    img, extent = render_surface_density(xv[:, :3], m, npix=64,
                                         extent=(-6, 6, -2, 2))
    pix_area = (12.0 / 64) * (4.0 / 64)
    captured = img.sum() * pix_area
    # mass inside the |y| < 2 slab (projected): strictly less than total,
    # and matching a direct count within the kernel-smearing tolerance
    inside = m[(np.abs(xv[:, 0]) < 6) & (np.abs(xv[:, 1]) < 2)].sum()
    assert 0.8 * inside < captured < 1.1 * inside
    assert captured < 0.98 * m.sum()


def test_observed_pm_is_rate_of_returned_angles():
    """pm_phi1/pm_phi2 must be d(phi1)/dt, d(phi2)/dt of the RETURNED
    (galactocentric) angles even with a non-origin observer
    (r2 review)."""
    ang = np.linspace(-0.3, 0.3, 30)
    pos = 20.0 * np.column_stack([np.cos(ang), np.sin(ang), 0.1 * ang])
    vel = 100.0 * np.column_stack([-np.sin(ang), np.cos(ang),
                                   0.05 * np.ones_like(ang)])
    xv = np.hstack([pos, vel])
    obs_vec = [-8.2, 0.0, 0.02, 11.0, 245.0, 7.0]
    out = get_observed_stream_coords(xv, xv[15], observer=obs_vec)
    # finite difference: advance ballistically by dt and re-project in
    # the SAME frame
    dt = 1e-6
    xv2 = xv.copy()
    xv2[:, :3] += xv[:, 3:] * dt
    p1a, p2a = to_stream_coords(xv, out["rotation"])
    p1b, p2b = to_stream_coords(xv2, out["rotation"])
    # degrees=True default: pm must be in deg/time, the rate of the
    # RETURNED (degree) angles (r3 review: was rad/time regardless)
    np.testing.assert_allclose(out["pm_phi1"], (p1b - p1a) / dt,
                               rtol=1e-4, atol=6e-6)
    np.testing.assert_allclose(out["pm_phi2"], (p2b - p2a) / dt,
                               rtol=1e-4, atol=6e-6)
    # and radian mode stays km/s/kpc
    out_r = get_observed_stream_coords(xv, xv[15], observer=obs_vec,
                                       degrees=False)
    np.testing.assert_allclose(out_r["pm_phi1"],
                               np.deg2rad(out["pm_phi1"]), rtol=1e-12)


def test_convert_vectors_nan_position_propagates():
    """A NaN position corrupts the local basis: the output row must be
    NaN even when the target basis doesn't use that coordinate
    (r2 review: the check was a no-op over positions)."""
    v = np.array([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    p = np.array([[1.0, 2.0, 3.0], [1.0, 2.0, np.nan]])
    out = convert_vectors(vectors=v, positions=p,
                          from_sys="cart", to_sys="cyl")
    assert np.isfinite(out[0]).all()
    assert np.isnan(out[1]).all()


def test_fit_iterative_ellipsoid_zero_iterations():
    """n_iter=0 returns the identity result instead of NameError."""
    rng = np.random.default_rng(5)
    res = fit_iterative_ellipsoid(rng.normal(size=(500, 3)), n_iter=0)
    assert res["iterations"] == 0 and not res["converged"]
    np.testing.assert_array_equal(res["axes"], np.eye(3))


def test_smoothing_lengths_single_particle():
    """A lone particle must not IndexError in the cKDTree path."""
    from nbody_streams_tpu.viz.sph import get_smoothing_lengths

    h = get_smoothing_lengths(np.array([[1.0, 2.0, 3.0]]))
    assert h.shape == (1,) and h[0] == 0.0


def test_plot_stream_evolution_times_mismatch():
    """An off-by-one times list must raise, not mislabel panels."""
    import pytest

    from nbody_streams_tpu.viz.plots import plot_stream_evolution

    rng = np.random.default_rng(6)
    xv = rng.normal(size=(50, 100, 6))
    with pytest.raises(ValueError, match="neither axis"):
        plot_stream_evolution(xv, np.arange(49), mass=1.0)


def test_convert_coords_batched_leading_shape():
    """(S, N, 3) input round-trips with the leading shape preserved
    (r3 review: 2-D-only indexing crashed on batched input)."""
    from nbody_streams_tpu.coords import convert_vectors

    x = np.random.default_rng(3).normal(size=(2, 5, 3))
    s = convert_coords(x, "cart", "sph")
    assert s.shape == (2, 5, 3)
    np.testing.assert_allclose(convert_coords(s, "sph", "cart"), x,
                               atol=1e-12)
    np.testing.assert_allclose(s[1], convert_coords(x[1], "cart", "sph"))
    # reference contract: positional call returns (pos_new, vec_new)
    p_new, v = convert_vectors(x, x, "cart", "cyl")
    assert p_new.shape == v.shape == (2, 5, 3)
    _, v0 = convert_vectors(x[0], x[0], "cart", "cyl")
    np.testing.assert_allclose(v[0], v0)
    # native keyword form returns the vectors only
    v_nat = convert_vectors(vectors=x, positions=x, from_sys="cart",
                            to_sys="cyl", position_system="cart")
    np.testing.assert_allclose(v_nat, v)
    los = convert_to_vel_los(x, x)
    assert los.shape == (2, 5)
    import pytest

    with pytest.raises(ValueError, match="does not match"):
        convert_vectors(x, x[0], "cart", "sph")


def test_to_stream_coords_single_row():
    """One (6,) phase-space row works like every other coords API
    (r3 review: IndexError)."""
    xv = np.random.default_rng(4).normal(size=(7, 6)) * 10
    rot = np.eye(3)
    p1, p2 = to_stream_coords(xv[0], rot)
    P1, P2 = to_stream_coords(xv, rot)
    assert np.ndim(p1) == 0
    np.testing.assert_allclose([p1, p2], [P1[0], P2[0]])


def test_find_center_empty_velocity_aperture_raises(plummer):
    """An explicit vel_aperture selecting zero particles must raise, not
    return NaN (r3 review; also: 0 is no longer treated as 'unset')."""
    xv, m = plummer
    with pytest.raises(ValueError, match="selects no particles"):
        find_center(xv[:, :3] + 5.0, vel=xv[:, 3:], mass=m,
                    method="shrinking_sphere", vel_aperture=1e-12)


def test_generate_stream_coords_auto_prog_ignores_nan_rows():
    """Unreleased spray particles are NaN rows; the auto progenitor must
    be the median-nearest RELEASED particle, not index 0 via NaN
    poisoning (r3 review)."""
    rng = np.random.default_rng(8)
    xv = rng.normal(size=(60, 6)) + np.array([40.0, 0, 0, 0, 0, 0])
    xv[0] = [500.0, 0, 0, 0, 0, 0]          # far outlier at index 0
    xv_nan = xv.copy()
    xv_nan[30:] = np.nan                     # half not yet released
    p1a, p2a = generate_stream_coords(xv[:30])
    p1b, p2b = generate_stream_coords(xv_nan)
    np.testing.assert_allclose(p1b[:30], p1a, atol=1e-12)
    assert np.isnan(p1b[30:]).all()
    with pytest.raises(ValueError, match="no finite particle rows"):
        generate_stream_coords(np.full((5, 6), np.nan))


def test_render_surface_density_degenerate_positions_raises():
    """Point-source or NaN positions must raise a clear error instead
    of returning an all-NaN image (r3 review)."""
    from nbody_streams_tpu.viz.sph import render_surface_density

    pos = np.zeros((100, 3))
    with pytest.raises(ValueError, match="degenerate or non-finite"):
        render_surface_density(pos, np.ones(100))
    with pytest.raises(ValueError, match="empty extent"):
        render_surface_density(np.random.default_rng(0).normal(size=(50, 3)),
                               np.ones(50), extent=(1.0, 1.0, -1.0, 1.0))
