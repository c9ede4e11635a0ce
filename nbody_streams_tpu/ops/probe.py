"""Session capacity probe: delivered Pallas VPU throughput.

The tunnelled chip's delivered compute varies by multiples between
sessions, and the penalty is specific to Mosaic-compiled kernels: a
degraded allocation runs Pallas fma chains at ~35% of the best-seen
rate while XLA-compiled elementwise stays near full speed
(docs/performance.md, 'Device-allocation variance').

The integrator's dispatch-length cap (run.py) sizes scanned sub-chunks
from a throughput model measured on a good allocation; a dispatch that
*executes* past ~60-100 s crashes the remote worker, so on a degraded
allocation the same model over-sizes the first dispatches by the same
~3x the bench probe observes.  This module measures the session's
actually-delivered Pallas fma rate once (cached per process, ~0.15 s
after the one-time compile) so the cap's estimate can be rescaled
before the first large dispatch.  bench.py runs the same style of
probe for its config auto-try; this one is deliberately smaller.
"""
from __future__ import annotations

import time

__all__ = ["delivered_pallas_tops", "rate_scale", "BEST_SEEN_TOPS"]

# Best sustained Pallas-compiled VPU fma seen on this container class
# (docs/performance.md); delivered/BEST_SEEN is the allocation scale.
BEST_SEEN_TOPS = 2.8
_SCALE_FLOOR = 0.15   # never assume worse than ~7x degradation

_cache: dict = {}


def delivered_pallas_tops(K: int = 256, iters: int = 1000,
                          interpret: bool = False) -> float:
    """Sustained Top/s of a Mosaic-compiled fma chain (~135 GFLOP).

    The ~58 ms tunnel dispatch latency is NOT a bounded perturbation at
    this probe size: ~48 ms of on-device work at the best-seen rate
    means latency would halve the reading and misclassify a *healthy*
    allocation as degraded (``BEST_SEEN_TOPS`` was calibrated with
    bench.py's 4x-larger probe where latency is a small fraction).  So
    the dispatch+transfer latency is measured with a trivially cheap
    executable of the same output shape and subtracted, bounded to at
    most a 4x correction so timer noise can never inflate the result
    unboundedly.  ``interpret=True`` lets tests run a tiny CPU
    configuration through the same graph."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x = jnp.full((512, 512), 1.25, jnp.float32)

    def fma_kernel(x_ref, o_ref):
        v = x_ref[:]
        acc = v
        for _ in range(K):
            acc = acc * v + v
        o_ref[:] = acc

    grid = max(iters // 8, 1)
    fma = pl.pallas_call(
        fma_kernel, grid=(grid,), interpret=interpret,
        in_specs=[pl.BlockSpec((512, 512), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((512, 512), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((512, 512), jnp.float32),
    )

    @jax.jit
    def chain(v):
        def body(c, _):
            return fma(c) * 1e-30 + v, None

        c, _ = jax.lax.scan(body, v, None, length=8)
        return c

    @jax.jit
    def trivial(v):
        return v + 1.0

    flops = 512 * 512 * K * 8 * grid * 2
    jax.device_get(trivial(x))  # compile
    t0 = time.perf_counter()
    jax.device_get(trivial(x))
    latency = time.perf_counter() - t0
    jax.device_get(chain(x))  # compile
    t0 = time.perf_counter()
    jax.device_get(chain(x))
    elapsed = time.perf_counter() - t0
    return flops / max(elapsed - latency, 0.25 * elapsed) / 1e12


def rate_scale() -> float:
    """Delivered/best-seen Pallas throughput in [_SCALE_FLOOR, 1.0],
    measured once per process.  Returns 1.0 (no rescale) if the probe
    itself fails — a broken probe must never block a run."""
    if "scale" not in _cache:
        try:
            tops = delivered_pallas_tops()
            _cache["scale"] = min(max(tops / BEST_SEEN_TOPS,
                                      _SCALE_FLOOR), 1.0)
        except Exception:
            _cache["scale"] = 1.0
    return _cache["scale"]
