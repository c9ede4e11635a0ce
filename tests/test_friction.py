"""Chandrasekhar dynamical friction: unit + behavioural tests
(reference: tests/test_chandrasekhar.py:59-783)."""
import jax.numpy as jnp
import numpy as np
import pytest

from nbody_streams_tpu import G_DEFAULT, Species, make_plummer_sphere, \
    place_on_orbit, run_simulation
from nbody_streams_tpu.friction import (
    ChandrasekharFriction,
    chandrasekhar_accel,
    compute_sigma_r,
    make_df_force_extra,
    shrinking_sphere_com,
)
from nbody_streams_tpu.potentials import NFWPotential


@pytest.fixture(scope="module")
def host():
    return NFWPotential(mass=1e12, scaleRadius=20.0)


def test_sigma_methods_agree_roughly(host):
    """Jeans and local-circular sigma agree within a factor ~2 for NFW."""
    s_jeans = compute_sigma_r(host, method="jeans")
    s_circ = compute_sigma_r(host, method="local_circular")
    for r in (5.0, 20.0, 80.0):
        a = float(s_jeans(jnp.asarray(r)))
        b = float(s_circ(jnp.asarray(r)))
        assert 0.4 < a / b < 2.5
        assert 20.0 < a < 300.0  # physically sane for a MW-mass halo


def test_quasispherical_is_native(host):
    # r1: this used to warn and fall back to Jeans; now it is a native
    # Eddington inversion (see test_quasispherical_sigma_matches_jeans)
    s = compute_sigma_r(host, method="quasispherical")
    assert float(s(jnp.asarray([10.0]))[0]) > 0


def test_shrinking_sphere_finds_offset_cluster(rng):
    xv, m = make_plummer_sphere(500, M_total=1e8, a=0.3, seed=4)
    offset = np.array([30.0, -10.0, 5.0])
    vbulk = np.array([50.0, 120.0, -30.0])
    pos = jnp.asarray(xv[:, :3] + offset)
    vel = jnp.asarray(xv[:, 3:] + vbulk)
    com, v_com, r_sph = shrinking_sphere_com(pos, vel, jnp.asarray(m))
    assert np.linalg.norm(np.asarray(com) - offset) < 0.5
    assert np.linalg.norm(np.asarray(v_com) - vbulk) < 10.0
    assert float(r_sph) > 0


def test_friction_opposes_motion(host):
    r_com = jnp.array([30.0, 0.0, 0.0])
    v_com = jnp.array([0.0, 150.0, 0.0])
    rho = host.density(r_com)
    sig = compute_sigma_r(host, method="jeans")(jnp.asarray(30.0))
    a = np.asarray(chandrasekhar_accel(r_com, v_com, 1e10, rho, sig, 0.0))
    # anti-parallel to v, zero perpendicular components
    assert a[1] < 0
    np.testing.assert_allclose(a[[0, 2]], 0.0, atol=abs(a[1]) * 1e-10)
    # more massive satellite -> stronger deceleration
    a2 = np.asarray(chandrasekhar_accel(r_com, v_com, 1e11, rho, sig, 0.0))
    assert abs(a2[1]) > abs(a[1])


def test_friction_zero_at_rest(host):
    a = np.asarray(chandrasekhar_accel(
        jnp.array([30.0, 0.0, 0.0]), jnp.zeros(3), 1e10,
        host.density(jnp.array([30.0, 0.0, 0.0])), jnp.asarray(100.0), 0.0))
    np.testing.assert_allclose(a, 0.0)


def test_factory_validation(host):
    with pytest.raises(ValueError, match="M_sat"):
        make_df_force_extra(host, M_sat=-1.0)
    with pytest.raises(ValueError, match="update_interval"):
        make_df_force_extra(host, M_sat=1e9, update_interval=0)


def test_orbit_decay_behavioral(host, tmp_path):
    """A massive satellite's orbit decays measurably; an ultralight one's
    does not (reference behavioural test)."""
    n = 60
    xv, m = make_plummer_sphere(n, M_total=1e6, a=0.2, seed=5)
    xv = place_on_orbit(xv, r_peri=28.0, r_apo=32.0, potential=host)
    sp = [Species.dark(N=n, mass=float(m[0]), softening=0.05)]
    t_end = 0.4  # ~0.4 kpc/(km/s) ~ 0.4 Gyr

    def mean_r(res):
        com = res["dark"][:, :3].mean(0)
        return np.linalg.norm(com)

    common = dict(
        time_start=0.0, time_end=t_end, dt=2e-3, architecture="cpu",
        external_potential=host, save_snapshots=False, verbose=False,
        precision="float64", df_update_interval=5,
    )
    res_heavy = run_simulation(
        xv, sp, dynamical_friction=True, df_M_sat=5e10,
        output_dir=str(tmp_path / "h"), **common)
    res_light = run_simulation(
        xv, sp, dynamical_friction=True, df_M_sat=1e4,
        output_dir=str(tmp_path / "l"), **common)

    r_heavy = mean_r(res_heavy)
    r_light = mean_r(res_light)
    # the light satellite stays on its ~30 kpc orbit; the heavy one sinks
    assert abs(r_light - 30.0) < 3.0
    assert r_heavy < r_light - 1.0


def test_df_requires_external_potential(tmp_path):
    xv, m = make_plummer_sphere(20, M_total=1e6, a=0.2, seed=6)
    sp = [Species.dark(N=20, mass=float(m[0]), softening=0.05)]
    with pytest.raises(ValueError, match="external_potential"):
        run_simulation(xv, sp, 0.0, 1e-3, 1e-3, architecture="cpu",
                       dynamical_friction=True,
                       output_dir=str(tmp_path), verbose=False)


def test_bound_center_phi_finds_cluster(rng):
    """Phi-energy bound centre: recovers the satellite amid unbound
    contaminants and reports the bound mass."""
    import jax.numpy as jnp

    from nbody_streams_tpu.friction import bound_center_phi
    from nbody_streams_tpu.ops import compute_potential_direct

    xv, m = make_plummer_sphere(400, M_total=1e8, a=0.3, seed=8)
    offset = np.array([20.0, 5.0, -3.0])
    vbulk = np.array([80.0, -40.0, 10.0])
    pos = xv[:, :3] + offset
    vel = xv[:, 3:] + vbulk
    # unbound interlopers flying through
    pos = np.vstack([pos, rng.normal(0, 30, (100, 3)) + offset])
    vel = np.vstack([vel, rng.normal(0, 500, (100, 3))])
    mass = np.concatenate([m, np.full(100, m[0])])
    phi = np.asarray(compute_potential_direct(pos, mass, 0.01,
                                              precision="float64"))
    r_com, v_com, bound, m_b = bound_center_phi(
        jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(mass),
        jnp.asarray(phi), jnp.asarray(offset + 1.0),
        jnp.asarray(vbulk * 1.0), 0.0)
    assert np.linalg.norm(np.asarray(r_com) - offset) < 0.5
    assert np.linalg.norm(np.asarray(v_com) - vbulk) < 15.0
    assert np.asarray(bound)[-100:].mean() < 0.2   # interlopers unbound
    assert float(m_b) < mass.sum()


def test_df_bound_phi_end_to_end(host, tmp_path):
    """run_simulation with the phi-energy DF path: runs, decays."""
    n = 50
    xv, m = make_plummer_sphere(n, M_total=1e6, a=0.2, seed=9)
    xv = place_on_orbit(xv, r_peri=28.0, r_apo=32.0, potential=host)
    sp = [Species.dark(N=n, mass=float(m[0]), softening=0.05)]
    res = run_simulation(
        xv, sp, 0.0, 0.2, 2e-3, architecture="cpu",
        external_potential=host, dynamical_friction=True,
        df_M_sat=5e10, df_com_method="bound_phi", df_update_interval=5,
        output_dir=str(tmp_path), save_snapshots=False, verbose=False,
        precision="float64",
    )
    com = res["dark"][:, :3].mean(0)
    assert np.isfinite(res["dark"]).all()
    assert np.linalg.norm(com) < 31.0   # decaying from ~30 kpc


def test_quasispherical_sigma_matches_jeans_for_isotropic():
    """Native Eddington-inversion sigma (r1 missing #6): for a
    self-consistent isotropic system the DF-moment dispersion equals the
    Jeans solution."""
    import jax.numpy as jnp

    from nbody_streams_tpu.friction import compute_sigma_r
    from nbody_streams_tpu.potentials.analytic import HernquistPotential

    pot = HernquistPotential(mass=1e12, scaleRadius=20.0)
    s_j = compute_sigma_r(pot, method="jeans")
    s_q = compute_sigma_r(pot, method="quasispherical")
    r = jnp.asarray(np.geomspace(0.5, 300, 12))
    np.testing.assert_allclose(np.asarray(s_q(r)), np.asarray(s_j(r)),
                               rtol=8e-3)
    with pytest.raises(ValueError):
        compute_sigma_r(pot, method="nope")
