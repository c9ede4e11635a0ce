"""Mesh-sharded direct summation: equivalence with the single-device path
on a virtual 8-device CPU mesh (the reference has no multi-device tier;
this is the TPU framework's replacement for its Barnes-Hut tree)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody_streams_tpu.ops.dispatch import DirectGravity
from nbody_streams_tpu import Species, make_plummer_sphere, run_simulation


@pytest.fixture(scope="module")
def cluster():
    rng = np.random.default_rng(7)
    n = 1000  # deliberately not divisible by 8 (tests padding)
    return (
        rng.normal(0, 1, (n, 3)),
        rng.uniform(0.5, 2.0, n) * 1e5,
        rng.uniform(0.05, 0.3, n),
    )


def test_eight_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("precision", ["float32_kahan", "float64"])
def test_sharded_accel_matches_single(cluster, precision):
    pos, mass, soft = cluster
    single = DirectGravity(mass, soft, G=4.3e-6, impl="jnp",
                           precision=precision)
    shard = DirectGravity(mass, soft, G=4.3e-6, impl="sharded",
                          precision=precision, devices=jax.devices())
    p = jnp.asarray(pos, single.dtype)
    a1 = np.asarray(single.accel(p))
    a2 = np.asarray(shard.accel(p))
    tol = 1e-14 if precision == "float64" else 1e-6
    np.testing.assert_allclose(a2, a1, atol=tol * np.abs(a1).max())


@pytest.mark.parametrize("kernel", ["spline", "plummer", "newtonian"])
def test_sharded_potential_matches_single(cluster, kernel):
    pos, mass, soft = cluster
    single = DirectGravity(mass, soft, G=4.3e-6, impl="jnp",
                           precision="float64", kernel=kernel)
    shard = DirectGravity(mass, soft, G=4.3e-6, impl="sharded",
                          precision="float64", kernel=kernel,
                          devices=jax.devices())
    p = jnp.asarray(pos)
    p1 = np.asarray(single.potential(p))
    p2 = np.asarray(shard.potential(p))
    np.testing.assert_allclose(p2, p1, atol=1e-13 * np.abs(p1).max())


def test_method_tree_runs_sharded_end_to_end(tmp_path):
    """run_simulation(method='tree') = sharded direct tier; trajectory must
    match the single-device direct path to fp tolerance."""
    xv, m = make_plummer_sphere(256, M_total=1e4, a=0.01, seed=11)
    sp = [Species.dark(N=256, mass=float(m[0]), softening=0.003)]
    kw = dict(time_start=0.0, time_end=2e-4, dt=2e-5, architecture="cpu",
              save_snapshots=False, verbose=False, precision="float64")
    res_direct = run_simulation(xv, sp, output_dir=str(tmp_path / "a"),
                                method="direct", **kw)
    res_tree = run_simulation(xv, sp, output_dir=str(tmp_path / "b"),
                              method="tree", devices=jax.devices(), **kw)
    np.testing.assert_allclose(res_tree["dark"], res_direct["dark"],
                               rtol=1e-10, atol=1e-12)


def test_slab_sort_for_sharding_preserves_physics(rng):
    """Slab sorting is pure bookkeeping: the 8-device ring on sorted
    input matches the unsorted result after unpermuting."""
    import numpy as np

    from nbody_streams_tpu.ops.dispatch import DirectGravity
    from nbody_streams_tpu.parallel.sharded import slab_sort_for_sharding

    n = 512
    xv = rng.normal(0, 1, (n, 6))
    m = rng.uniform(0.5, 1.5, n)
    h = np.full(n, 0.05)
    xv_s, m_s, h_s = slab_sort_for_sharding(xv, m, h)
    assert np.all(np.diff(xv_s[:, 0]) >= 0)

    import jax
    import jax.numpy as jnp

    devs = jax.devices()
    s0 = DirectGravity(m, h, kernel="spline", impl="sharded",
                       devices=devs)
    s1 = DirectGravity(m_s, h_s, kernel="spline", impl="sharded",
                       devices=devs)
    a0 = np.asarray(s0.accel(jnp.asarray(xv[:, :3], s0.dtype)))
    a1 = np.asarray(s1.accel(jnp.asarray(xv_s[:, :3], s1.dtype)))
    order = np.argsort(xv[:, 0], kind="stable")
    np.testing.assert_allclose(a1, a0[order], rtol=2e-5, atol=1e-8)
