"""MW + LMC evolving-potential workflow (potentials/mwlmc.py).

Loads the real shipped trajectory/acceleration tables and the two
GalPot-built INIs (reference: data/potentials/MW_LMC_evolv/ +
examples/MW_LMC_evolv.ipynb).
"""
import numpy as np
import pytest

from nbody_streams_tpu.potentials.mwlmc import (
    load_mw_lmc_potential,
    mw_lmc_data_dir,
)


@pytest.fixture(scope="module")
def mwlmc():
    return load_mw_lmc_potential()


def test_fixture_files_shipped():
    base = mw_lmc_data_dir()
    for name in ("McMillan17_streams.ini", "LMC_vasiliev21.ini",
                 "trajLMC_McM17streams", "accMW_McM17streams"):
        assert (base / name).exists(), name


def test_present_day_circular_velocity(mwlmc):
    pot, _ = mwlmc
    f = np.asarray(pot.force(np.array([[8.2, 0.0, 0.0]]), t=0.0))
    vc = np.sqrt(-f[0, 0] * 8.2)
    # McMillan17_streams variant of the MW (Shipp+2021 fits)
    assert 220.0 < vc < 245.0


def test_lmc_moves_and_deepens_potential(mwlmc):
    pot, traj = mwlmc
    assert traj.shape[1] == 7
    for t_probe in (-1.0, -4.0):
        i = np.argmin(np.abs(traj[:, 0] - t_probe))
        x_lmc = traj[i, 1:4]
        near = float(np.asarray(pot.potential(
            x_lmc[None] + np.array([[0.5, 0, 0]]), t=traj[i, 0]))[0])
        far = float(np.asarray(pot.potential(
            x_lmc[None] + np.array([[80.0, 0, 0]]), t=traj[i, 0]))[0])
        assert near < far < 0.0


def test_time_continuity_and_frame_acceleration(mwlmc):
    pot, _ = mwlmc
    x = np.array([[20.0, 5.0, -3.0]])
    p1 = float(np.asarray(pot.potential(x, t=-2.0))[0])
    p2 = float(np.asarray(pot.potential(x, t=-2.0 + 1e-4))[0])
    assert p2 == pytest.approx(p1, rel=1e-5)
    # the non-inertial term: force at the origin equals -a_MW(t)
    # (MW contributes ~0 by symmetry; LMC pull is what a_MW encodes, so
    # the total residual force at the origin is small compared to the
    # LMC's direct pull at its pericentre distance)
    pot_nof, traj = load_mw_lmc_potential(include_frame_acceleration=False)
    i = np.argmin(np.abs(traj[:, 0] + 0.1))
    f_with = np.asarray(pot.force(np.zeros((1, 3)), t=traj[i, 0]))[0]
    f_without = np.asarray(pot_nof.force(np.zeros((1, 3)),
                                         t=traj[i, 0]))[0]
    assert np.linalg.norm(f_with) < 0.6 * np.linalg.norm(f_without)


def test_orbit_rewind_in_evolving_field(mwlmc):
    pot, _ = mwlmc
    from nbody_streams_tpu.fast_sims.orbits import integrate_orbit

    sat_now = np.array([17.5, 2.5, -6.5, 237.9, -24.3, 209.0])
    _, back = integrate_orbit(pot, sat_now, 0.0, -2.0, n_steps=512)
    xv_past = np.asarray(back)[-1]
    assert np.isfinite(xv_past).all()
    # forward again recovers the present state (reversibility check)
    _, fwd = integrate_orbit(pot, xv_past, -2.0, 0.0, n_steps=512)
    np.testing.assert_allclose(np.asarray(fwd)[-1], sat_now, rtol=2e-3,
                               atol=0.5)


def test_spray_stream_in_mw_lmc(mwlmc):
    pot, _ = mwlmc
    from nbody_streams_tpu.fast_sims.spray import (
        create_particle_spray_stream,
    )

    out = create_particle_spray_stream(
        pot_host=pot, initmass=1e8,
        sat_cen_present=np.array([17.5, 2.5, -6.5, 237.9, -24.3, 209.0]),
        scaleradius=0.5, num_particles=400, time_total=1.5,
        time_end=0.0, n_steps=256, seed=1)
    part = out["part_xv"]
    assert part.shape == (400, 6)
    assert np.isfinite(part).all()
    # the stream spreads along the orbit but stays bound to the Galaxy
    r = np.linalg.norm(part[:, :3], axis=1)
    assert r.max() < 300.0 and r.min() > 1.0
