"""SCF (Hernquist-Ostriker basis-expansion) gravity tier.

Validation strategy (three independent anchors, no circularity):

1. **Analytic norm**: K_00 = 1/3 in closed form; a second norm is
   cross-checked against an independent scipy.integrate.quad of the
   same defining integral written from scratch.
2. **Biorthogonality round-trip through autodiff**: a random coefficient
   set defines Phi; rho := lap(Phi) / 4 pi G via jax.hessian (a route
   that never touches the K_nl quadrature); projecting that rho back
   must recover the input coefficients.
3. **Analytic targets**: the n=0, l=0 basis member IS the Hernquist
   potential (sampled-particle test), and a *Plummer* density (not a
   basis member) represented by quadrature-weighted particles must
   converge to the analytic Plummer field as nmax grows.

Role parity: the reference's tree tier accuracy ladder
(reference: tree_gpu/tests/test_accuracy.py theta-convergence) — here the
dials are (nmax, lmax).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody_streams_tpu.ops.scf import (
    SCFGravity,
    _l_mask,
    _radial_norms,
    scf_coefficients,
    scf_potential,
)
from nbody_streams_tpu.potentials.fit import _symmetry_labels

G = 4.300917270069976e-06


def _quad_grid(n_r=64, n_th=24, n_ph=16, rmax_xi=0.999):
    """Deterministic quadrature 'particles' covering all space:
    Gauss-Legendre in xi = (s-1)/(s+1) and cos(theta), uniform phi.
    Returns positions and volume weights (multiply by rho for masses)."""
    xi, wxi = np.polynomial.legendre.leggauss(n_r)
    xi = (xi + 1) / 2 * (rmax_xi + 1) - 1
    wxi = wxi / 2 * (rmax_xi + 1)
    r = (1 + xi) / (1 - xi)
    dr = 2 / (1 - xi) ** 2
    ct, wct = np.polynomial.legendre.leggauss(n_th)
    ph = np.linspace(0, 2 * np.pi, n_ph, endpoint=False)
    wph = np.full(n_ph, 2 * np.pi / n_ph)
    R, CT, PH = np.meshgrid(r, ct, ph, indexing="ij")
    W = ((wxi * dr * r**2)[:, None, None] * wct[None, :, None]
         * wph[None, None, :])
    ST = np.sqrt(1 - CT**2)
    pos = np.stack([R * ST * np.cos(PH), R * ST * np.sin(PH), R * CT],
                   -1).reshape(-1, 3)
    return pos, W.reshape(-1)


def test_radial_norms_analytic():
    K = _radial_norms(3, 1)
    # K_00 = int s^2/(1+s)^4 ds = 1/3 exactly
    np.testing.assert_allclose(K[0, 0], 1.0 / 3.0, rtol=1e-12)
    # independent quadrature of the defining integral for (n, l) = (2, 1)
    from scipy.integrate import quad
    from scipy.special import gegenbauer

    l, n = 1, 2
    C = gegenbauer(n, 2 * l + 1.5)
    dC = C.deriv()

    def phi(s):
        return -(s**l) / (1 + s) ** (2 * l + 1) * C((s - 1) / (s + 1))

    def dphi(s):
        xi = (s - 1) / (s + 1)
        base = s**l / (1 + s) ** (2 * l + 1)
        return -(base * (l / s - (2 * l + 1) / (1 + s)) * C(xi)
                 + base * dC(xi) * 2 / (1 + s) ** 2)

    val, _ = quad(lambda s: (dphi(s) ** 2
                             + l * (l + 1) * (phi(s) / s) ** 2) * s**2,
                  0, np.inf, limit=400)
    np.testing.assert_allclose(K[n, l], val, rtol=1e-9)


def test_biorthogonality_roundtrip_via_autodiff_laplacian():
    """rho derived from Phi by jax.hessian (independent of the norm
    quadrature) projects back to the exact input coefficients."""
    nmax, lmax = 3, 2
    labels = tuple(_symmetry_labels(lmax, lmax, "none"))
    P = (nmax + 1) * (lmax + 1)
    K_flat = jnp.asarray(_radial_norms(nmax, lmax).T.reshape(-1))
    mask = jnp.asarray(_l_mask(nmax, lmax, labels))
    rng = np.random.default_rng(3)
    A_in = jnp.asarray(rng.normal(0, 1, (P, len(labels)))
                       * np.asarray(mask))

    def phi_one(x):
        return scf_potential(x[None, :], A_in, 1.0, G, nmax, lmax,
                             labels)[0]

    def rho_one(x):
        return jnp.trace(jax.hessian(phi_one)(x)) / (4 * np.pi * G)

    pos_q, w = _quad_grid(n_r=80, n_th=32, n_ph=24)
    mq = np.asarray(jax.vmap(rho_one)(jnp.asarray(pos_q))) * w
    A_rec = scf_coefficients(jnp.asarray(pos_q), jnp.asarray(mq), 1.0,
                             nmax, lmax, labels, K_flat, mask)
    err = (np.abs(np.asarray(A_rec) - np.asarray(A_in)).max()
           / np.abs(np.asarray(A_in)).max())
    assert err < 1e-4, err


def test_hernquist_monopole_exact():
    """nmax = lmax = 0 with a = a_true: the single basis member IS the
    Hernquist potential, so a Hernquist sample reproduces the analytic
    field to sampling noise (~1/sqrt(N))."""
    rng = np.random.default_rng(0)
    N = 200_000
    u = rng.uniform(0, 1, N)
    s = np.clip(np.sqrt(u) / (1 - np.sqrt(u)), 0, 1e4)
    d = rng.normal(size=(N, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    a_true, M = 2.0, 1e9
    pos = (s * a_true)[:, None] * d
    m = np.full(N, M / N)

    solver = SCFGravity(m, nmax=0, lmax=0, a=a_true, G=G,
                        precision="float64")
    r_eval = np.geomspace(0.1, 50, 12)
    pts = np.column_stack([r_eval, np.zeros_like(r_eval),
                           np.zeros_like(r_eval)])
    phi, acc = solver.field(jnp.asarray(pos), jnp.asarray(pts))
    phi_true = -G * M / (r_eval + a_true)
    acc_true = -G * M / (r_eval + a_true) ** 2
    assert np.abs(np.asarray(phi) / phi_true - 1).max() < 6e-3
    assert np.abs(np.asarray(acc)[:, 0] / acc_true - 1).max() < 6e-3


def test_plummer_quadrature_convergence_ladder():
    """Plummer (NOT a basis member) via quadrature particles: the field
    error must fall steeply with nmax — the SCF analogue of the tree
    suite's theta-convergence ladder."""
    M, ap = 1e9, 1.3

    def rho(r, ct):
        return 3 * M / (4 * np.pi * ap**3) * (1 + (r / ap) ** 2) ** -2.5

    pos, w = _quad_grid()
    m = w * rho(np.linalg.norm(pos, axis=1), None)

    pts_r = np.geomspace(0.05, 30, 16)
    pts = np.column_stack([pts_r * 0.6, pts_r * 0.48, pts_r * 0.64])
    rr = np.linalg.norm(pts, axis=1)
    phi_true = -G * M / np.sqrt(rr**2 + ap**2)
    acc_true = (-G * M * (rr**2 + ap**2) ** -1.5)[:, None] * pts

    errs = []
    for nmax in (2, 8, 16):
        sol = SCFGravity(m, nmax=nmax, lmax=0, a=1.0, G=G,
                         precision="float64")
        phi, acc = sol.field(jnp.asarray(pos), jnp.asarray(pts))
        e_phi = np.abs(np.asarray(phi) / phi_true - 1).max()
        e_acc = (np.linalg.norm(np.asarray(acc) - acc_true, axis=1)
                 / np.linalg.norm(acc_true, axis=1)).max()
        errs.append((e_phi, e_acc))
    # measured: phi 1.0e-1 / 2.5e-4 / 1.2e-7; acc converges too (worst
    # point is the innermost radius where |acc| -> 0)
    assert errs[0][0] > 30 * errs[1][0] > 900 * errs[2][0]
    assert errs[2][0] < 1e-6 and errs[2][1] < 1e-3


def test_flattened_needs_l_terms():
    """A flattened sample: adding l terms must reduce the field error
    (angular convergence dial)."""
    rng = np.random.default_rng(1)
    N = 60_000
    u = rng.uniform(0, 1, N)
    s = np.clip(np.sqrt(u) / (1 - np.sqrt(u)), 0, 100)
    d = rng.normal(size=(N, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pos = (s * 1.0)[:, None] * d
    pos[:, 2] *= 0.5
    m = np.full(N, 1e9 / N)

    from nbody_streams_tpu.ops import pairwise

    pts_r = np.geomspace(0.3, 8, 10)
    pts = np.column_stack([pts_r * 0.37, pts_r * 0.21, pts_r * 0.9])
    phi_ref = np.concatenate([
        np.asarray(pairwise.compute_potential_direct(
            np.vstack([pts, pos]), np.concatenate([np.zeros(len(pts)), m]),
            np.full(len(pts) + N, 1e-6), G=G, kernel="plummer"))[:len(pts)]
    ])

    def field_err(lmax):
        sol = SCFGravity(m, nmax=10, lmax=lmax, a=1.0, G=G,
                         precision="float64", symmetry="axisymmetric")
        phi, _ = sol.field(jnp.asarray(pos), jnp.asarray(pts))
        return np.abs(np.asarray(phi) / phi_ref - 1).max()

    e0, e4 = field_err(0), field_err(4)
    assert e4 < 0.5 * e0, (e0, e4)
    assert e4 < 0.02, e4


def test_symmetry_and_com_options():
    rng = np.random.default_rng(2)
    pos = rng.normal(0, 1, (5000, 3))
    m = np.full(5000, 1e9 / 5000)
    # spherical symmetry keeps only (0, 0)
    sol = SCFGravity(m, nmax=4, lmax=4, a=1.0, G=G, symmetry="spherical")
    assert sol.labels == ((0, 0),)
    # 'com' centering: accelerations are translation-covariant (the
    # tolerance budgets the fp32 quantisation of the shifted INPUT
    # coordinates, ~eps * shift absolute, which perturbs the sample)
    sol2 = SCFGravity(m, nmax=4, lmax=2, a=1.0, G=G, center="com")
    a0 = np.asarray(sol2.accel(jnp.asarray(pos, jnp.float32)))
    a1 = np.asarray(sol2.accel(jnp.asarray(pos + 37.5, jnp.float32)))
    np.testing.assert_allclose(a1, a0, atol=1e-3 * np.abs(a0).max())
    # auto-a from phase_space median radius
    sol3 = SCFGravity(m, nmax=2, lmax=0, G=G,
                      phase_space=np.hstack([pos, 0 * pos]))
    med = np.median(np.linalg.norm(pos, axis=1))
    np.testing.assert_allclose(sol3.a, med, rtol=1e-12)
    with pytest.raises(ValueError, match="phase_space"):
        SCFGravity(m, nmax=2, lmax=0, G=G)


def test_run_simulation_scf_end_to_end(tmp_path):
    """Flagship integration through the driver: energy conservation,
    snapshots, and the strict scf_* kwarg guard."""
    import nbody_streams_tpu as nst

    xv, m = nst.make_plummer_sphere(4000, 1e9, 1.0, seed=7)
    sp = [nst.Species(name="dark", N=4000, mass=float(m[0]),
                      softening=0.05)]
    out = nst.run_simulation(xv, sp, 0.0, 0.01, 1e-4, architecture="cpu",
                             method="scf", scf_nmax=6, scf_lmax=2,
                             output_dir=str(tmp_path), snapshots=3,
                             debug_energy=True, verbose=False)
    assert out["dark"].shape == (4000, 6)

    # independent fp64 energy bracket on the SCF field itself
    from nbody_streams_tpu.ops.scf import SCFGravity as S

    sol = S(m, nmax=6, lmax=2, a=1.0, G=nst.G_DEFAULT, precision="float64")

    def energy(arr):
        phi = np.asarray(sol.potential(jnp.asarray(arr[:, :3])))
        ke = 0.5 * (m * (arr[:, 3:] ** 2).sum(1)).sum()
        return ke + 0.5 * (m * phi).sum()

    e0, e1 = energy(xv), energy(out["dark"])
    assert abs((e1 - e0) / e0) < 1e-4

    with pytest.raises(TypeError, match="scf_"):
        nst.run_simulation(xv, sp, 0.0, 0.001, 1e-4, method="direct",
                           scf_nmax=4, output_dir=str(tmp_path),
                           save_snapshots=False)
    with pytest.raises(TypeError, match="impl"):
        nst.run_simulation(xv, sp, 0.0, 0.001, 1e-4, method="scf",
                           impl="pallas", output_dir=str(tmp_path),
                           save_snapshots=False)
    # kernel= and devices= are equally dead with method='scf'
    with pytest.raises(TypeError, match="kernel"):
        nst.run_simulation(xv, sp, 0.0, 0.001, 1e-4, method="scf",
                           kernel="plummer", output_dir=str(tmp_path),
                           save_snapshots=False)
    # float32_fast only exists on the direct Pallas path: warn like
    # DirectGravity does instead of silently degrading
    from nbody_streams_tpu.species import PerformanceWarning

    with pytest.warns(PerformanceWarning, match="float32_fast"):
        nst.run_simulation(xv, sp, 0.0, 2e-4, 1e-4, method="scf",
                           precision="float32_fast", scf_nmax=2,
                           scf_lmax=0, output_dir=str(tmp_path),
                           save_snapshots=False, overwrite=True)


def test_scf_momentum_near_conservation():
    """SCF forces are not pairwise, so momentum is conserved only to
    truncation order — but a near-equilibrium sphere must show a net
    force far below the typical |m a| scale."""
    import nbody_streams_tpu as nst

    xv, m = nst.make_plummer_sphere(20000, 1e9, 1.0, seed=9)
    sol = SCFGravity(m, nmax=8, lmax=4, a=1.0, G=G, precision="float64")
    acc = np.asarray(sol.accel(jnp.asarray(xv[:, :3])))
    net = np.abs((m[:, None] * acc).sum(0)).max()
    scale = np.abs(m[:, None] * acc).sum(0).max()
    assert net < 2e-3 * scale, (net, scale)


def test_scf_shards_under_gspmd():
    """The coefficient contraction + basis evaluation are plain matmuls /
    elementwise ops: jit with row-sharded inputs runs under GSPMD with no
    bespoke communication code and matches the single-device result."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    rng = np.random.default_rng(4)
    n = 4096
    pos = jnp.asarray(rng.normal(0, 1, (n, 3)), jnp.float32)
    m = np.full(n, 1e9 / n)
    sol = SCFGravity(m, nmax=6, lmax=2, a=1.0, G=G)
    ref = np.asarray(jax.jit(sol.accel)(pos))

    mesh = Mesh(np.array(devs[:8]), ("p",))
    sh = NamedSharding(mesh, P("p", None))
    pos_sh = jax.device_put(pos, sh)
    out = np.asarray(jax.jit(sol.accel)(pos_sh))
    np.testing.assert_allclose(out, ref, atol=5e-6 * np.abs(ref).max())


# ---------------------------------------------------------------------------
# Clustered geometry: where single-center SCF leaves the tree's accuracy
# class, and the multi-center composite restores it (r4 verdict item 3)
# ---------------------------------------------------------------------------

def _hernquist_sample(rng, n, a, m_tot, center):
    u = rng.uniform(0, 1, n)
    s = np.sqrt(u) / (1 - np.sqrt(u))
    s = np.clip(s, 0, 50)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pos = a * s[:, None] * d + np.asarray(center)
    m = np.full(n, m_tot / n)
    return pos, m


def _two_center_system(rng, n_mw=12000, n_sat=4000, mass_ratio=0.1,
                       d_sat=8.0, a_sat=0.3):
    """MW-like Hernquist at the origin + satellite clump at distance."""
    pos1, m1 = _hernquist_sample(rng, n_mw, 1.0, 1e9, (0, 0, 0))
    pos2, m2 = _hernquist_sample(rng, n_sat, a_sat, mass_ratio * 1e9,
                                 (d_sat, 0.0, 0.0))
    return np.vstack([pos1, pos2]), np.concatenate([m1, m2]), n_mw


def _median_rel_force_err(acc, acc_ref, sel=slice(None)):
    num = np.linalg.norm(np.asarray(acc)[sel] - acc_ref[sel], axis=1)
    den = np.linalg.norm(acc_ref[sel], axis=1)
    return float(np.median(num / den))


def test_two_center_composite_restores_accuracy():
    """(a) MW+LMC-like two-center config: the single-center expansion
    falls far out of the 1-5% class on the satellite's particles; the
    per-group composite at the SAME truncation restores it.  Pins the
    accuracy table in docs/performance.md."""
    from nbody_streams_tpu.ops import pairwise
    from nbody_streams_tpu.ops.scf import CompositeSCFGravity

    rng = np.random.default_rng(11)
    pos, m, n_mw = _two_center_system(rng)
    acc_ref = np.asarray(pairwise.compute_forces_direct(
        pos, m, 1e-6, G=G, kernel="plummer", precision="float64"))

    single = SCFGravity(m, nmax=8, lmax=4, a=1.0, G=G, precision="float64")
    err_single_sat = _median_rel_force_err(
        single.accel(jnp.asarray(pos)), acc_ref, slice(n_mw, None))

    comp = CompositeSCFGravity(
        m, groups=[(slice(0, n_mw), {"a": 1.0}),
                   (slice(n_mw, None), {"a": 0.3, "center": "com"})],
        G=G, precision="float64", nmax=8, lmax=4)
    acc_c = comp.accel(jnp.asarray(pos))
    err_comp_sat = _median_rel_force_err(acc_c, acc_ref, slice(n_mw, None))
    err_comp_all = _median_rel_force_err(acc_c, acc_ref)

    # single-center: satellite particles are dominated by their own
    # clump's self-gravity, which a basis centred 8a away cannot resolve
    assert err_single_sat > 0.05, err_single_sat
    # composite at the same per-group truncation: back in the tree's
    # accuracy class (measured 4.9% — the 4000-particle satellite's
    # shot-noise floor; (12,6) only reaches 4.5%)
    assert err_comp_sat < 0.055, err_comp_sat
    assert err_comp_all < 0.05, err_comp_all
    # the potential path sums the same way
    phi = np.asarray(comp.potential(jnp.asarray(pos)))
    phi_ref = np.asarray(pairwise.compute_potential_direct(
        pos, m, 1e-6, G=G, kernel="plummer", precision="float64"))
    assert float(np.median(np.abs(phi / phi_ref - 1))) < 0.02


def test_offcenter_satellite_composite():
    """(b) Small off-center dissolving-progenitor clump (1:100 at 5a):
    same failure mode, same fix."""
    from nbody_streams_tpu.ops import pairwise
    from nbody_streams_tpu.ops.scf import CompositeSCFGravity

    rng = np.random.default_rng(12)
    pos, m, n_mw = _two_center_system(rng, n_mw=12000, n_sat=3000,
                                      mass_ratio=0.01, d_sat=5.0,
                                      a_sat=0.1)
    acc_ref = np.asarray(pairwise.compute_forces_direct(
        pos, m, 1e-6, G=G, kernel="plummer", precision="float64"))

    single = SCFGravity(m, nmax=8, lmax=4, a=1.0, G=G, precision="float64")
    err_single_sat = _median_rel_force_err(
        single.accel(jnp.asarray(pos)), acc_ref, slice(n_mw, None))

    comp = CompositeSCFGravity(
        m, groups=[(slice(0, n_mw), {"a": 1.0}),
                   (slice(n_mw, None), {"a": 0.1, "center": "com"})],
        G=G, precision="float64", nmax=8, lmax=4)
    err_comp_sat = _median_rel_force_err(
        comp.accel(jnp.asarray(pos)), acc_ref, slice(n_mw, None))

    assert err_single_sat > 0.05, err_single_sat
    # measured 6.0% at (8,4): the concentrated 1:100 clump's sampled
    # shot-noise floor (5.5% at (12,6), 5.0% at n_sat=6000 — order and
    # sample size barely move it, so this is the sample, not the basis)
    assert err_comp_sat < 0.07, err_comp_sat


def test_composite_group_validation():
    from nbody_streams_tpu.ops.scf import CompositeSCFGravity

    m = np.full(100, 1.0)
    ps = np.random.default_rng(0).normal(size=(100, 6))
    # overlap
    with pytest.raises(ValueError, match="overlap"):
        CompositeSCFGravity(m, groups=[(slice(0, 60), {"a": 1.0}),
                                       (slice(50, 100), {"a": 1.0})],
                            phase_space=ps)
    # gap
    with pytest.raises(ValueError, match="no group"):
        CompositeSCFGravity(m, groups=[(slice(0, 60), {"a": 1.0})],
                            phase_space=ps)
    # empty slice
    with pytest.raises(ValueError, match="no particles"):
        CompositeSCFGravity(m, groups=[(slice(0, 0), {"a": 1.0}),
                                       (slice(0, 100), {"a": 1.0})],
                            phase_space=ps)


def test_run_simulation_scf_groups_end_to_end(tmp_path):
    """run_simulation(method='scf', scf_groups=...) installs the
    multi-center composite tier, mapping species names onto contiguous
    group slices; unknown species names fail loudly."""
    import nbody_streams_tpu as nst

    rng = np.random.default_rng(5)
    xv_mw, m_mw = nst.make_plummer_sphere(3000, 1e9, 1.0, seed=5)
    xv_sat, m_sat = nst.make_plummer_sphere(1000, 1e8, 0.3, seed=6)
    xv_sat[:, 0] += 6.0
    xv_sat[:, 4] += 150.0
    xv = np.concatenate([xv_mw, xv_sat])
    sp = [nst.Species(name="mw", N=3000, mass=m_mw, softening=0.05),
          nst.Species(name="sat", N=1000, mass=m_sat, softening=0.05)]
    out = nst.run_simulation(
        xv, sp, 0.0, 5e-3, 1e-4, architecture="cpu", method="scf",
        scf_nmax=4, scf_lmax=2,
        scf_groups={"mw": {"a": 1.0},
                    "sat": {"a": 0.3, "center": "com"}},
        output_dir=str(tmp_path), snapshots=2, verbose=False)
    assert out["mw"].shape == (3000, 6)
    assert out["sat"].shape == (1000, 6)
    assert np.isfinite(out["sat"]).all()
    # the satellite must still be a bound clump around its own center
    com = out["sat"][:, :3].mean(0)
    assert np.median(np.linalg.norm(out["sat"][:, :3] - com, axis=1)) < 2.0

    with pytest.raises(ValueError, match="unknown species"):
        nst.run_simulation(
            xv, sp, 0.0, 1e-3, 1e-4, architecture="cpu", method="scf",
            scf_groups={"nope": {"a": 1.0}},
            output_dir=str(tmp_path / "x"), save_snapshots=False,
            verbose=False)
