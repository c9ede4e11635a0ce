"""Tree-tier compat surface: TreeGPU / tree_gravity_gpu /
run_nbody_gpu_tree (reference: tree_gpu/_force.py:167,224,
tree_gpu/run_gpu_tree.py:142) backed by exact direct summation."""
import numpy as np
import pytest

import nbody_streams_tpu as nst
from tests.numpy_oracle import oracle_forces, oracle_potential


@pytest.fixture(scope="module")
def cluster():
    rng = np.random.default_rng(11)
    pos = rng.normal(0, 1.0, (300, 3))
    mass = rng.uniform(0.5, 2.0, 300) * 1e6
    return pos, mass


def test_tree_gravity_matches_oracle(cluster):
    pos, mass = cluster
    with pytest.warns(UserWarning, match="exact"):
        acc, phi = nst.tree_gravity_gpu(pos, mass, eps=0.1, theta=0.5)
    assert acc.shape == (300, 3) and phi.shape == (300,)
    ref_acc = oracle_forces(pos, mass, np.full(300, 0.1), nst.G_DEFAULT,
                            kind="plummer")
    ref_phi = oracle_potential(pos, mass, np.full(300, 0.1), nst.G_DEFAULT,
                               kind="plummer")
    np.testing.assert_allclose(acc, ref_acc, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(phi, ref_phi, rtol=2e-4)


def test_handle_reuse_caches_solver(cluster):
    pos, mass = cluster
    tree = nst.TreeGPU(300, eps=0.1)
    a1, _ = nst.tree_gravity_gpu(pos, mass, eps=0.1, tree=tree)
    solver = tree._solver
    a2, _ = nst.tree_gravity_gpu(pos + 0.1, mass, eps=0.1, tree=tree)
    assert tree._solver is solver          # same mass/eps: no rebuild
    assert not np.allclose(a1, a2)


def test_run_nbody_gpu_tree_end_to_end(tmp_path, cluster):
    pos, mass = cluster
    vel = np.zeros_like(pos)
    xv = np.hstack([pos, vel])
    out = nst.run_nbody_gpu_tree(
        xv, mass, 0.0, 10 * 2e-4, 2e-4, softening=0.1, theta=0.6,
        output_dir=str(tmp_path / "o"), snapshots=2, verbose=False)
    assert out.shape == (300, 6) and np.isfinite(out).all()


def test_handle_eps_honoured_without_explicit_arg(cluster):
    """A handle built with eps=0.2 must not silently fall back to the
    0.05 function default (r2 review)."""
    pos, mass = cluster
    t1 = nst.TreeGPU(300, eps=0.4)
    a_handle, _ = nst.tree_gravity_gpu(pos, mass, tree=t1)
    a_explicit, _ = nst.tree_gravity_gpu(pos, mass, eps=0.4)
    np.testing.assert_allclose(a_handle, a_explicit, rtol=1e-6)
    a_default, _ = nst.tree_gravity_gpu(pos, mass)   # eps = 0.05
    assert np.abs(a_handle - a_default).max() > 0
