"""Single-chip kernel headroom study (round-3 verdict item 8).

1. Tile-geometry sweep: (TM, TN, MAX_SUB) over the force kernel at
   N = 64k and 1M (spline + Kahan via the two-pass sorted path — the
   bench configuration).
2. Roofline microbenchmarks: sustained VPU fma throughput and rsqrt
   throughput on the same (TM, TN) tile shapes, to convert the kernel's
   ops/pair budget into a speed-of-light bound.

Each measurement is amortised in-graph (lax.scan) because per-dispatch
tunnel latency is ~58 ms on this container.  Prints one JSON line per
measurement.  Run on the real TPU; every new tile variant costs a
remote compile (~1-3 min cold).
"""
import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def _time_ingraph(fn, arg, iters):
    import jax

    out = fn(arg)          # compile
    jax.device_get(out)
    t0 = time.perf_counter()
    jax.device_get(fn(arg))
    return (time.perf_counter() - t0) / iters


def sweep(n, iters, geoms):
    import jax
    import jax.numpy as jnp

    from nbody_streams_tpu.ops import pallas_direct as pd

    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.normal(0, 1.0, (n, 3)), jnp.float32)
    gm = jnp.asarray(rng.uniform(0.5, 1.5, n) * 4.3e-6, jnp.float32)
    h = jnp.full((n,), 0.05, jnp.float32)

    results = {}
    for tm, tn, ms in geoms:
        @jax.jit
        def force_iters(p, _tm=tm, _tn=tn, _ms=ms):
            def body(c, _):
                a = pd._pallas_self_sorted(p + c, gm, h, "spline", True,
                                           "acc", 1e-15,
                                           tm=_tm, tn=_tn, max_sub=_ms)
                return c + a[0, 0] * 1e-30, None

            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
            return c

        try:
            dt = _time_ingraph(force_iters, pos, iters)
        except Exception as exc:  # compile failures are data too
            print(json.dumps({"metric": "tile_sweep", "n": n,
                              "tm": tm, "tn": tn, "max_sub": ms,
                              "error": str(exc)[:200]}), flush=True)
            continue
        gints = n * n / dt / 1e9
        results[(tm, tn, ms)] = gints
        print(json.dumps({"metric": "tile_sweep", "n": n, "tm": tm,
                          "tn": tn, "max_sub": ms,
                          "ms_per_eval": dt * 1e3,
                          "gint_per_s": gints}), flush=True)
    return results


def roofline():
    """Pure-VPU peaks on a (512, 512) f32 tile: fma chain and rsqrt."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K = 512  # chained ops per grid step

    def fma_kernel(x_ref, o_ref):
        x = x_ref[:]
        acc = x
        for _ in range(K):
            acc = acc * x + x
        o_ref[:] = acc

    def rsqrt_kernel(x_ref, o_ref):
        x = x_ref[:]
        acc = x
        for _ in range(K):
            acc = jax.lax.rsqrt(acc + x)
        o_ref[:] = acc

    shape = (512, 512)
    x = jnp.full(shape, 1.25, jnp.float32)
    grid = 256

    for name, kern, ops_per_iter in [("fma", fma_kernel, 2),
                                     ("rsqrt", rsqrt_kernel, 1)]:
        f = pl.pallas_call(
            kern, grid=(grid,),
            in_specs=[pl.BlockSpec(shape, lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(shape, lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        )
        jf = jax.jit(f)
        jax.device_get(jf(x))
        t0 = time.perf_counter()
        jax.device_get(jf(x))
        dt = time.perf_counter() - t0
        lanes = shape[0] * shape[1] * K * grid
        print(json.dumps({
            "metric": f"vpu_{name}_throughput",
            "g_ops_per_s": lanes * ops_per_iter / dt / 1e9,
            "g_lanes_per_s": lanes / dt / 1e9,
            "wall_s": dt}), flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    if mode in ("roofline", "all"):
        roofline()
    if mode in ("sweep64k", "all"):
        sweep(65536, 50, [(512, 512, 16), (512, 512, 32),
                          (256, 512, 32), (512, 1024, 8),
                          (512, 256, 32), (256, 1024, 16)])
    if mode in ("refine64k",):
        # around the first-pass winner (256, 512, 32) = 149.8 Gint/s
        sweep(65536, 50, [(256, 512, 16), (128, 512, 32),
                          (256, 512, 64), (384, 512, 32),
                          (256, 512, 32)])
    if mode in ("sweep1m",):
        sweep(1_048_576, 2, [(512, 512, 16), (256, 512, 32),
                             (256, 512, 16)])
