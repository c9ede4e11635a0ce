"""Real-TPU smoke tier (round-3 verdict item 3).

Run with ``NBODY_TEST_TPU=1 python -m pytest -m tpu`` on a host with the
TPU attached.  Everything here executes on the actual chip — the
integrator driver, an evolving MW+LMC potential inside the scanned step,
a dynamical-friction run, the tree compat shim, and ``impl='sharded'``
on a 1-device TPU mesh — because round-2 fix batches repeatedly found
Mosaic/axon behaviours that CPU-only coverage cannot catch (x64 leakage,
block_until_ready semantics, remote-compile costs).

Budget: ~6 min with a warm compilation cache (measured 366 s; small N,
few steps —
accuracy is pinned by the CPU suites; this tier proves the code paths
*execute* on hardware).  The BFE test adds ~8.5 min on a cold cache
(two grad-through-evaluator jit compiles); warm it is seconds.  Reference analogue: the reference runs its
whole suite on its real backend (tests/test_physics.py GPU variants).
"""
import os

import numpy as np
import pytest

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(not os.environ.get("NBODY_TEST_TPU"),
                       reason="NBODY_TEST_TPU not set"),
]


@pytest.fixture(scope="module")
def tpu_device():
    import jax

    dev = jax.devices()[0]
    if dev.platform not in ("tpu", "axon"):
        pytest.skip(f"first device is {dev.platform}, not a TPU")
    return dev


@pytest.fixture(scope="module")
def plummer_small():
    from nbody_streams_tpu import make_plummer_sphere

    xv, m = make_plummer_sphere(512, M_total=1e9, a=1.0, seed=3)
    return xv, m


def test_run_simulation_direct_on_chip(tpu_device, plummer_small, tmp_path):
    """Flagship path: run_simulation -> Pallas kernel inside the scanned
    KDK step, snapshots + restart + energy diagnostics on."""
    from nbody_streams_tpu import ParticleReader, Species, run_simulation

    xv, m = plummer_small
    sp = [Species.dark(N=512, mass=float(m[0]), softening=0.05)]
    res = run_simulation(xv, sp, 0.0, 5e-3, 5e-4, architecture="tpu",
                         method="direct", output_dir=str(tmp_path),
                         snapshots=3, verbose=False, debug_energy=True)
    out = res["dark"]
    assert out.shape == (512, 6) and np.all(np.isfinite(out))
    reader = ParticleReader(str(tmp_path / "snapshot.h5"))
    assert reader.Snapshots.size == 3
    assert (tmp_path / "restart.npz").exists()


def test_evolving_mwlmc_potential_in_scan_on_chip(tpu_device, tmp_path):
    """The MW+LMC evolving potential (trajectory-shifted LMC + accelerated
    frame) evaluated inside the scanned step on hardware."""
    from nbody_streams_tpu import Species, run_simulation
    from nbody_streams_tpu.potentials.mwlmc import load_mw_lmc_potential

    pot, _traj = load_mw_lmc_potential()
    rng = np.random.default_rng(0)
    n = 128
    xv = np.zeros((n, 6))
    xv[:, :3] = rng.normal(0, 1, (n, 3)) + np.array([-8.0, 0, 20.0])
    xv[:, 3:] = rng.normal(0, 30.0, (n, 3))
    sp = [Species.star(N=n, mass=1.0, softening=0.01)]
    res = run_simulation(xv, sp, 0.0, 2e-3, 2e-4, architecture="tpu",
                         external_potential=pot, save_snapshots=False,
                         output_dir=str(tmp_path), verbose=False)
    assert np.all(np.isfinite(res["star"]))


def test_dynamical_friction_run_on_chip(tpu_device, tmp_path):
    """DF force_extra (sigma spline + CoM tracking) inside the scanned
    step on hardware."""
    from nbody_streams_tpu import Species, run_simulation
    from nbody_streams_tpu.potentials import NFWPotential

    host = NFWPotential(mass=1e12, scaleRadius=15.0)
    rng = np.random.default_rng(1)
    n = 256
    xv = np.zeros((n, 6))
    xv[:, :3] = rng.normal(0, 0.5, (n, 3)) + np.array([40.0, 0, 0])
    xv[:, 4] = 120.0
    sp = [Species.dark(N=n, mass=1e7, softening=0.1)]
    res = run_simulation(xv, sp, 0.0, 2e-3, 2e-4, architecture="tpu",
                         external_potential=host, dynamical_friction=True,
                         df_sigma_method="local_circular",
                         save_snapshots=False, output_dir=str(tmp_path),
                         verbose=False)
    assert np.all(np.isfinite(res["dark"]))


def test_tree_shim_on_chip(tpu_device, plummer_small):
    """tree_gravity_gpu compat shim (cached exact solver) on hardware."""
    from nbody_streams_tpu.tree import TreeGPU, tree_gravity_gpu

    xv, m = plummer_small
    acc, phi = tree_gravity_gpu(xv[:, :3], m, eps=0.05)
    assert np.all(np.isfinite(np.asarray(acc)))
    assert np.all(np.asarray(phi) <= 0)
    handle = TreeGPU(512, eps=0.05)
    acc2, phi2 = tree_gravity_gpu(xv[:, :3], m, eps=0.05, tree=handle)
    np.testing.assert_allclose(np.asarray(acc2), np.asarray(acc),
                               rtol=1e-6, atol=1e-8)


def test_sorted_presort_path_on_chip(tpu_device):
    """The slab-sorted two-pass split with a chunk-reused sort order —
    the flagship large-N configuration (sorted Pallas + MXU moments +
    carry-threaded order) — compiled and stepped on the real chip.
    N = 16384 is the smallest N that takes the sorted path."""
    import jax
    import jax.numpy as jnp

    from nbody_streams_tpu import make_plummer_sphere
    from nbody_streams_tpu.integrate import (
        init_state,
        make_accel_fn,
        make_kdk_step,
        run_chunk,
    )
    from nbody_streams_tpu.ops.dispatch import DirectGravity

    n = 16384
    xv, m = make_plummer_sphere(n, M_total=1e9, a=1.0, seed=4)
    solver = DirectGravity(m, np.full(n, 0.05), impl="pallas")
    assert solver.spatial_sort_active
    accel_fn = make_accel_fn(solver, solver.mass)
    step_fn = make_kdk_step(accel_fn, 2e-5, 0.0)
    state = init_state(xv[:, :3], xv[:, 3:], accel_fn, solver.mass, 0.0)
    state = run_chunk(step_fn, state, 5, presort=True)
    pos = np.asarray(jax.device_get(state.pos))
    assert np.all(np.isfinite(pos))
    # carried order is a real permutation of 0..n-1
    order = np.asarray(jax.device_get(state.sort_order))
    assert np.array_equal(np.sort(order), np.arange(n))
    # MXU potential row-sum path on hardware, against the jnp oracle
    phi = np.asarray(solver.potential(state.pos,
                                      order=jnp.asarray(order)))
    oracle = DirectGravity(m, np.full(n, 0.05), impl="jnp")
    phi_o = np.asarray(oracle.potential(state.pos))
    np.testing.assert_allclose(phi, phi_o, atol=3e-6 * np.abs(phi_o).max())


def test_scf_tier_on_chip(tpu_device, tmp_path):
    """method='scf' (Hernquist-Ostriker expansion) on hardware: the
    coefficient contraction, basis recurrences and autodiff gradient
    executed on the chip, through the full driver; and the solver-level
    result pinned against the CPU fp32 oracle far below the ~1e-3
    single-pass-bf16 floor (validates the Precision.HIGHEST matmuls —
    the accuracy dial (nmax, lmax) must keep working on real TPUs)."""
    import jax
    import jax.numpy as jnp

    from nbody_streams_tpu import Species, make_plummer_sphere, run_simulation
    from nbody_streams_tpu.ops.scf import SCFGravity

    n = 8192
    xv, m = make_plummer_sphere(n, M_total=1e9, a=1.0, seed=5)
    pos32 = np.asarray(xv[:, :3], np.float32)
    scf = SCFGravity(m, nmax=8, lmax=4, a=1.0)
    a_tpu = np.asarray(scf.accel(jnp.asarray(pos32)))
    with jax.default_device(jax.devices("cpu")[0]):
        scf_cpu = SCFGravity(np.asarray(m), nmax=8, lmax=4, a=1.0)
        a_cpu = np.asarray(scf_cpu.accel(jnp.asarray(pos32)))
    assert np.all(np.isfinite(a_tpu))
    assert np.max(np.abs(a_tpu - a_cpu)) < 3e-5 * np.abs(a_cpu).max()

    sp = [Species.dark(N=n, mass=float(m[0]), softening=0.05)]
    res = run_simulation(xv, sp, 0.0, 1e-3, 1e-4, architecture="tpu",
                         method="scf", scf_nmax=6, scf_lmax=2,
                         save_snapshots=False, output_dir=str(tmp_path),
                         verbose=False, debug_energy=True)
    assert np.all(np.isfinite(res["dark"]))


def test_sharded_on_one_device_tpu_mesh(tpu_device, plummer_small):
    """impl='sharded' on a 1-device TPU mesh: the Pallas ring branch
    (use_pallas auto-True) under shard_map on the real chip, against the
    single-chip Pallas path."""
    import jax
    import jax.numpy as jnp

    from nbody_streams_tpu.ops.dispatch import DirectGravity

    xv, m = plummer_small
    soft = np.full(512, 0.05)
    sharded = DirectGravity(m, soft, impl="sharded",
                            devices=[tpu_device])
    assert sharded._sharded.use_pallas
    single = DirectGravity(m, soft, impl="pallas")
    p = jnp.asarray(xv[:, :3], jnp.float32)
    a_s = np.asarray(sharded.accel(p))
    a_1 = np.asarray(single.accel(p))
    np.testing.assert_allclose(a_s, a_1, atol=2e-6 * np.abs(a_1).max())
    p_s = np.asarray(sharded.potential(p))
    p_1 = np.asarray(single.potential(p))
    np.testing.assert_allclose(p_s, p_1, atol=2e-6 * np.abs(p_1).max())


def test_xla_two_pass_backend_on_chip(tpu_device):
    """The XLA two-pass backend (impl='xla') on real hardware: one-shot
    accel (cond guard) matches the Pallas kernel, and a presorted
    scanned chunk with the poison guard + in-scan resort stays finite
    and agrees with it.  N = 16384 is the smallest sorted-path size."""
    import jax
    import jax.numpy as jnp

    from nbody_streams_tpu import make_plummer_sphere
    from nbody_streams_tpu.integrate import (
        init_state, make_accel_fn, make_kdk_step, run_chunk)
    from nbody_streams_tpu.ops.dispatch import DirectGravity

    n = 16384
    xv, m = make_plummer_sphere(n, M_total=1e9, a=1.0, seed=4)
    soft = np.full(n, 0.05)
    pos = jnp.asarray(xv[:, :3], jnp.float32)

    sx = DirectGravity(m, soft, kernel="spline",
                       precision="float32_kahan", impl="xla")
    sp = DirectGravity(m, soft, kernel="spline",
                       precision="float32_kahan", impl="pallas")
    ax = np.asarray(jax.device_get(sx.accel(pos)), float)
    ap = np.asarray(jax.device_get(sp.accel(pos)), float)
    assert np.isfinite(ax).all()
    rel = np.abs(ax - ap).max() / np.abs(ap).max()
    assert rel < 5e-6

    # scanned stepping: poison guard + presort_every (in-graph argsort)
    accel_fn = make_accel_fn(sx, sx.mass)
    step_fn = make_kdk_step(accel_fn, dt=2e-5, t0=0.0)
    state = init_state(xv[:, :3], xv[:, 3:], accel_fn, sx.mass, 0.0,
                       sort_fn=sx.sort_key)
    assert sx.presort_interval == 10
    state = run_chunk(step_fn, state, 25, presort=True,
                      presort_every=sx.presort_interval)
    out = np.asarray(jax.device_get(state.pos))
    assert np.isfinite(out).all()


def test_bfe_potentials_on_chip(tpu_device):
    """BFE evaluators (CylSpline Hermite dot, Multipole quintic) on real
    hardware against their analytic sources.  The CylSpline cell
    evaluation ends in a vmapped dot (potentials/cylspline.py) that XLA
    may batch onto the MXU, whose fp32 default is single-pass bf16
    operands — this pins the precision=HIGHEST guarantee where the CPU
    suite cannot (same failure class as the Pallas moment truncation,
    docs/performance.md 'MXU bf16 operand truncation')."""
    import jax
    import jax.numpy as jnp

    from nbody_streams_tpu.potentials.analytic import (
        MiyamotoNagaiPotential, PlummerPotential)
    from nbody_streams_tpu.potentials.coefs import (
        CylSplineCoefs, MultipoleCoefs)
    from nbody_streams_tpu.potentials.cylspline import CylSplinePotential
    from nbody_streams_tpu.potentials.multipole import MultipolePotential

    rng = np.random.default_rng(0)

    # CylSpline from a tabulated Miyamoto-Nagai disk
    mn = MiyamotoNagaiPotential(mass=5e10, scaleRadius=3.0,
                                scaleHeight=0.3)
    r_grid = np.concatenate([[0.0], np.geomspace(0.1, 100.0, 30)])
    zp = np.geomspace(0.05, 100.0, 15)
    z_grid = np.concatenate([-zp[::-1], [0.0], zp])
    rr, zz = np.meshgrid(r_grid, z_grid, indexing="ij")
    tab = np.asarray(mn.potential(np.column_stack(
        [rr.ravel(), np.zeros(rr.size), zz.ravel()]))).reshape(rr.shape)
    cs = CylSplinePotential(CylSplineCoefs(
        R_grid=r_grid, z_grid=z_grid, m_values=[0], phi=tab[None]))
    pts = rng.normal(0, 10, (2048, 3)).astype(np.float32)
    f = np.asarray(jax.device_get(jax.jit(cs.force)(jnp.asarray(pts))))
    f_ref = np.asarray(mn.force(pts))
    assert np.isfinite(f).all()
    assert np.abs(f - f_ref).max() / np.abs(f_ref).max() < 5e-3

    # Multipole from a sampled Plummer sphere (l=0)
    pl = PlummerPotential(mass=1e11, scaleRadius=5.0)
    rg = np.geomspace(0.05, 500, 40)
    pts_r = np.column_stack([rg, 0 * rg, 0 * rg])
    phi_r = np.asarray(pl.potential(pts_r))
    dphi = -np.asarray(pl.force(pts_r))[:, 0]
    mp = MultipolePotential(MultipoleCoefs(
        R_grid=rg, lm_labels=[(0, 0)], phi=phi_r[:, None],
        dphi_dr=dphi[:, None]))
    g = np.asarray(jax.device_get(jax.jit(mp.force)(jnp.asarray(pts))))
    g_ref = np.asarray(pl.force(pts))
    assert np.isfinite(g).all()
    assert np.abs(g - g_ref).max() / np.abs(g_ref).max() < 1e-4
