"""Comprehensive benchmark suite (`python -m nbody_streams_tpu.bench_suite`).

Native equivalent of the reference's `python -m nbody_streams.fields`
benchmark CLI (reference: fields.py:1201-1796): per-kernel and
per-precision force/potential timings, backend cross-validation, host
transfer overhead, and N-scaling — adapted to how TPUs must be
measured: every timing runs inside a single jitted `lax.scan` (per-call
dispatch over the remote-device tunnel costs ~10 ms and would swamp the
kernel), and synchronisation uses `jax.device_get` (axon's
`block_until_ready` does not block).

Usage:
    python -m nbody_streams_tpu.bench_suite [-N 65536] [--reps 6]
"""
from __future__ import annotations

import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _timeit_scan(fn, carry0, reps):
    @jax.jit
    def run(c):
        def body(c, _):
            out = fn(c)
            return c + 1e-30 * out[: c.shape[0]], None

        c, _ = lax.scan(body, c, None, length=reps)
        return c

    jax.device_get(run(carry0))           # compile + warm
    t0 = time.perf_counter()
    jax.device_get(run(carry0))
    return (time.perf_counter() - t0) / reps


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-N", type=int, default=65536)
    ap.add_argument("--reps", type=int, default=6)
    args = ap.parse_args(argv)
    n, reps = args.N, args.reps

    from . import make_plummer_sphere
    from .ops.dispatch import DirectGravity

    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    print(f"N = {n}, reps = {reps} (scan-amortised)\n")

    xv, m = make_plummer_sphere(n, M_total=1e9, a=1.0, seed=2)
    pos64 = xv[:, :3]
    soft = np.full(n, 0.05)

    # ---- section 1: force throughput by kernel x precision ------------
    print("SECTION 1: force kernels (Gint/s = N^2 pair interactions/s)")
    results = {}
    for kernel in ("spline", "plummer", "dehnen_k1", "newtonian"):
        for precision in ("float32_kahan", "float32"):
            solver = DirectGravity(m, soft, kernel=kernel,
                                   precision=precision)
            p0 = jnp.asarray(pos64, solver.dtype)
            dt = _timeit_scan(lambda c, s=solver: s.accel(c), p0, reps)
            gint = n * n / dt / 1e9
            results[(kernel, precision)] = gint
            print(f"  {kernel:10s} {precision:14s} {dt*1e3:9.2f} ms "
                  f"{gint:8.1f} Gint/s")

    # float64 rows (jnp oracle path — the Pallas kernel is fp32-only by
    # design, matching the reference's fp64 fallback matrix rows,
    # fields.py:1201-1796).  Two kernels bound the cost: f64 on the v5e
    # is emulated and ~50-100x slower than fp32, so skip above 256k
    # (an N=1M f64 eval would run tens of minutes).
    if n <= 262144:
        with jax.enable_x64():
            for kernel in ("spline", "newtonian"):
                solver = DirectGravity(m.astype(np.float64), soft,
                                       kernel=kernel, precision="float64")
                p0 = jnp.asarray(pos64, jnp.float64)
                dt = _timeit_scan(lambda c, s=solver: s.accel(c), p0,
                                  max(1, reps // 3))
                gint = n * n / dt / 1e9
                results[(kernel, "float64")] = gint
                print(f"  {kernel:10s} {'float64':14s} {dt*1e3:9.2f} ms "
                      f"{gint:8.1f} Gint/s")
    else:
        print("  (float64 rows skipped above N=262144: emulated f64 "
              "would run tens of minutes per eval)")

    # ---- section 2: potential kernel ----------------------------------
    print("\nSECTION 2: potential (vs force) kernel")
    solver = DirectGravity(m, soft, kernel="spline",
                           precision="float32_kahan")
    p0 = jnp.asarray(pos64, solver.dtype)
    dtf = _timeit_scan(lambda c: solver.accel(c), p0, reps)
    dtp = _timeit_scan(lambda c: solver.potential(c)[:, None], p0, reps)
    print(f"  force {dtf*1e3:9.2f} ms   potential {dtp*1e3:9.2f} ms "
          f"({dtf/dtp:.2f}x)")

    # ---- section 3: cross-backend validation --------------------------
    print("\nSECTION 3: validation vs the float64 jnp oracle (n=4096 "
          "subset)")
    nv = min(n, 4096)
    with jax.enable_x64():
        oracle = DirectGravity(m[:nv], soft[:nv], kernel="spline",
                               precision="float64", impl="jnp")
        a_ref = np.asarray(oracle.accel(jnp.asarray(pos64[:nv],
                                                    jnp.float64)), float)
    scale = np.abs(a_ref).max()
    for precision in ("float32_kahan", "float32"):
        s = DirectGravity(m[:nv], soft[:nv], kernel="spline",
                          precision=precision)
        a = np.asarray(s.accel(jnp.asarray(pos64[:nv], s.dtype)), float)
        err = np.abs(a - a_ref).max() / scale
        net = np.abs((m[:nv, None] * a).sum(0)).max() \
            / np.abs(m[:nv, None] * a).sum()
        print(f"  {precision:14s} max rel err {err:.2e}   "
              f"net-force/|F|sum {net:.2e}")

    # ---- section 4: host transfer overhead ----------------------------
    print("\nSECTION 4: host <-> device transfer")
    x = jnp.asarray(pos64, jnp.float32)
    jax.device_get(x)
    t0 = time.perf_counter()
    for _ in range(10):
        jax.device_get(x)
    d2h = (time.perf_counter() - t0) / 10
    print(f"  D->H (N,3) float32: {d2h*1e3:.2f} ms "
          f"({pos64.nbytes / 2 / d2h / 1e9:.2f} GB/s)")

    # ---- section 5: N-scaling -----------------------------------------
    print("\nSECTION 5: N-scaling (spline + Kahan)")
    for nn in (16384, 65536, 262144):
        if nn > n * 4:
            break
        xvn, mn = make_plummer_sphere(nn, M_total=1e9, a=1.0, seed=2)
        s = DirectGravity(mn, np.full(nn, 0.05), kernel="spline",
                          precision="float32_kahan")
        p = jnp.asarray(xvn[:, :3], s.dtype)
        dt = _timeit_scan(lambda c, s=s: s.accel(c), p,
                          max(2, reps // 2))
        print(f"  N={nn:8d}: {dt*1e3:9.2f} ms  {nn*nn/dt/1e9:8.1f} "
              f"Gint/s")

    print("\ndone.")


if __name__ == "__main__":
    main()
