"""SCF expansion-tier demo: million-particle self-gravity in milliseconds.

The reference framework's answer to "N > 2M is too slow for direct
summation" is its Barnes-Hut GPU tree (README.md:848-855, ~1-2 s per
force call at 2M, 1-5% force error).  The TPU-shaped answer is the
Hernquist-Ostriker basis expansion (`method='scf'`, ops/scf.py): the
particle density is projected onto a biorthogonal basis and the smooth
truncated field evaluated back — two dense MXU matmul passes, O(N·terms)
per step, measured 30 ms/KDK step at N=1M on one v5e
(docs/performance.md, "SCF expansion tier").

This demo
1. integrates an equilibrium Plummer sphere with `method='scf'` and
   checks energy conservation of the truncated (but conservative) field,
2. measures the per-step rate vs the exact direct tier at the same N,
3. prints the accuracy ladder: median relative force error vs the exact
   direct sum as (nmax, lmax) grows — showing truncation order is the
   accuracy dial, and that (8, 4) sits in the reference tree's 1-5%
   class.

Run:  python examples/scf_expansion.py [N] [steps]
Defaults: N=200_000, steps=400 (a few minutes on one TPU; any backend
works — the expansion is plain XLA matmuls).
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon TPU plugin force-registers itself and ignores the env
    # var; honouring it needs the config override before backend init
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from nbody_streams_tpu import G_DEFAULT, Species, make_plummer_sphere, run_simulation
from nbody_streams_tpu.ops.dispatch import DirectGravity
from nbody_streams_tpu.ops.scf import SCFGravity

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 400
DT = 2e-5
SOFT = 0.05

xv, masses = make_plummer_sphere(N, M_total=1e9, a=1.0, seed=4)
species = [Species.dark(N=N, mass=float(masses[0]), softening=SOFT)]

# ── 1. Integrate with the expansion field ────────────────────────────────────
t0 = time.perf_counter()
result = run_simulation(
    xv, species, 0.0, STEPS * DT, DT,
    architecture="auto", method="scf", scf_nmax=8, scf_lmax=4,
    save_snapshots=False, verbose=True, debug_energy=True,
    output_dir="./output_scf_demo", overwrite=True,
)
wall = time.perf_counter() - t0
print(f"scf run: {STEPS} steps in {wall:.1f} s "
      f"({1e3 * wall / STEPS:.1f} ms/step incl. energy diagnostics)")

# ── 2. Per-force-eval rate vs the exact direct tier ─────────────────────────
import jax.numpy as jnp
import jax

pos32 = jnp.asarray(xv[:, :3], jnp.float32)
scf = SCFGravity(masses, a=1.0, nmax=8, lmax=4)
direct = DirectGravity(masses, np.full(N, SOFT))
for name, solver in (("scf (8,4)", scf), ("direct", direct)):
    jax.block_until_ready(solver.accel(pos32))  # compile
    t0 = time.perf_counter()
    jax.block_until_ready(solver.accel(pos32))
    print(f"  {name:10s}: {1e3 * (time.perf_counter() - t0):8.2f} ms/force eval")

# ── 3. Accuracy ladder vs the exact direct sum ───────────────────────────────
a_ref = np.asarray(direct.accel(pos32), np.float64)
ref_norm = np.linalg.norm(a_ref, axis=1)
print("  (nmax, lmax)  terms  median rel force err")
for nmax, lmax in ((2, 0), (4, 2), (8, 4), (12, 6)):
    s = SCFGravity(masses, a=1.0, nmax=nmax, lmax=lmax)
    a = np.asarray(s.accel(pos32), np.float64)
    err = np.median(np.linalg.norm(a - a_ref, axis=1) / ref_norm)
    print(f"  ({nmax:2d}, {lmax:1d})      {s.terms:5d}  {err:.3f}")
