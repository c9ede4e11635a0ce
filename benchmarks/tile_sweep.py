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

    # precomputed slab order: stepping amortises the argsort across the
    # chunk (run_chunk presort), so the geometry sweep must measure the
    # kernel alone — a per-call sort would flatten geometry differences
    order = jnp.argsort(pos[:, 0])

    results = {}
    for tm, tn, ms in geoms:
        @jax.jit
        def force_iters(p, _tm=tm, _tn=tn, _ms=ms):
            def body(c, _):
                a = pd._pallas_self_sorted(p + c, gm, h, "spline", True,
                                           "acc", 1e-15,
                                           tm=_tm, tn=_tn, max_sub=_ms,
                                           order=order)
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
        ITERS = 20  # amortise the ~58 ms per-dispatch tunnel latency

        @jax.jit
        def chain(v):
            def body(c, _):
                return f(c), None

            c, _ = jax.lax.scan(body, v, None, length=ITERS)
            return c

        dt = _time_ingraph(chain, x, ITERS)
        lanes = shape[0] * shape[1] * K * grid
        print(json.dumps({
            "metric": f"vpu_{name}_throughput",
            "g_ops_per_s": lanes * ops_per_iter / dt / 1e9,
            "g_lanes_per_s": lanes / dt / 1e9,
            "ms_per_iter": dt * 1e3}), flush=True)


def sol(kind="spline", tm=None, tn=None, n_sub=None, blocks=2048, iters=10,
        mxu=False):
    """Arithmetic speed-of-light for the force tile.

    Runs the EXACT `_tile_sum` pair arithmetic (acc mode, Kahan
    superblock accumulate) on VMEM-resident data — no HBM streaming,
    no slab-band masking, no grid logistics — so pairs/s here is the
    pure-compute ceiling for this math at this tile geometry.  The
    ratio real-kernel / this = fraction of speed-of-light.  With
    ``mxu=True`` the tile is the MXU moment form (the shipped base
    pass, MXU_BASE default); ``mxu=False`` is the VPU s*dx tile
    (the band pass / single-pass kernel).  kind='newtonian' bounds the
    two-pass sorted kernel's dominant base pass; kind='spline' the
    single-pass kernel and the band pass."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from nbody_streams_tpu.ops import pallas_direct as pd

    tm = pd.TM if tm is None else tm
    tn = pd.TN if tn is None else tn
    n_sub = pd.MAX_SUB if n_sub is None else n_sub
    width = 4 if mxu else 3

    def kern(xt_ref, yt_ref, zt_ref, ht_ref,
             xs_ref, ys_ref, zs_ref, ms_ref, hs_ref, out_ref, comp_ref):
        xt, yt, zt, ht = (r[:] for r in (xt_ref, yt_ref, zt_ref, ht_ref))
        jb = pl.program_id(0)

        @pl.when(jb == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
            comp_ref[:] = jnp.zeros_like(comp_ref)

        partial = jnp.zeros((tm, width), jnp.float32)
        for k in range(n_sub):
            partial = partial + pd._tile_sum(
                kind, "acc", False, 1e-15, tm, tn, n_sub,
                xt, yt, zt, ht, None,
                xs_ref, ys_ref, zs_ref, ms_ref, hs_ref, k, jb, mxu=mxu)
        y = partial - comp_ref[:]
        t = out_ref[:] + y
        comp_ref[:] = (t - out_ref[:]) - y
        out_ref[:] = t

    rng = np.random.default_rng(3)
    tgt = [jnp.asarray(rng.normal(0, 1, (tm, 1)), jnp.float32)
           for _ in range(3)]
    tgt.append(jnp.full((tm, 1), 20.0, jnp.float32))          # 1/h
    src = [jnp.asarray(rng.normal(0, 1, (n_sub, tn)), jnp.float32)
           for _ in range(4)]
    src.append(jnp.full((n_sub, tn), 20.0, jnp.float32))      # 1/h

    f = pl.pallas_call(
        kern, grid=(blocks,),
        in_specs=[pl.BlockSpec(a.shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
                  for a in tgt + src],
        out_specs=pl.BlockSpec((tm, width), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tm, width), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tm, width), jnp.float32)],
    )

    @jax.jit
    def chain(xt):
        def body(c, _):
            out = f(c, *tgt[1:], *src)
            return c + out[:, :1] * 1e-30, None

        c, _ = jax.lax.scan(body, xt, None, length=iters)
        return c

    dt = _time_ingraph(chain, tgt[0], iters)
    pairs = tm * tn * n_sub * blocks
    print(json.dumps({
        "metric": f"{kind}_kahan_arith_speed_of_light",
        "mxu": mxu, "tm": tm, "tn": tn, "n_sub": n_sub,
        "g_pairs_per_s": pairs / dt / 1e9,
        "ms_per_iter": dt * 1e3}), flush=True)


if __name__ == "__main__":
    # supervised child (utils/supervise): kill+retry tunnel wedges
    from nbody_streams_tpu.utils.supervise import resupervise

    resupervise(__file__)
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    if mode in ("roofline", "all"):
        roofline()
    if mode in ("sol",):
        for kind in (sys.argv[2:] or ["spline", "newtonian"]):
            sol(kind)
    if mode in ("solmxu",):
        # ceiling of the SHIPPED base pass (MXU moment form, promoted
        # 512/512/16 geometry) and of the VPU band pass at the same
        # geometry, for the docs/performance.md roofline note
        sol("newtonian", mxu=True)
        sol("spline", mxu=False)
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
    if mode in ("mxu",):
        # MXU_BASE=True default: measures the MXU moment base pass
        sweep(65536, 50, [(128, 512, 32)])
        sweep(1_048_576, 2, [(128, 512, 32)])
    if mode in ("mxu2",):
        # geometry re-sweep under the MXU base pass
        sweep(65536, 50, [(256, 512, 32), (128, 512, 16),
                          (256, 512, 16), (128, 1024, 16)])
    if mode in ("mxu3",):
        sweep(65536, 50, [(512, 512, 16)])
        sweep(1_048_576, 2, [(256, 512, 32)])
    if mode in ("mxu4",):
        # 64k winner (512,512,16)=181.9 vs (256,512,32)=180.5; 1M has
        # (256,512,32)=218.4 — decide with (512,512,16/32) at 1M
        sweep(1_048_576, 2, [(512, 512, 16), (512, 512, 32)])
    if mode in ("reuse64k",):
        # geometry re-check under order-reuse (the sweep now measures
        # the kernel alone — the per-call argsort used to flatten
        # geometry differences): promoted winner + nearest rivals
        sweep(65536, 50, [(512, 512, 16), (256, 512, 32),
                          (512, 512, 32), (512, 1024, 16)])
    if mode in ("refine2",):
        # neighbourhood of the refine64k winner (128, 512, 32) = 150.3,
        # plus that geometry at 1M to confirm it holds at scale
        sweep(65536, 50, [(64, 512, 32), (128, 512, 16),
                          (128, 1024, 16)])
        sweep(1_048_576, 2, [(128, 512, 32)])
