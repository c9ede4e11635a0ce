"""Pallas vs XLA direct-backend comparison at one N (full KDK stepping).

Measures the two fp32 two-pass backends (`impl='pallas'` vs
`impl='xla'`) through the real integrator (`run_chunk`, scan-amortised,
with each backend's own presort policy) — the measurement behind the
`impl='auto'` crossover in ops/dispatch.py.  The per-session Mosaic
throttle is N-dependent (docs/performance.md 'Environment gotchas'):
a degraded allocation penalises small Pallas grids ~1.5x while 1M-scale
kernels run at full speed, so the auto choice must depend on N, not
just on the session probe.

Usage:  python benchmarks/impl_compare.py [N]
"""
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from nbody_streams_tpu import make_plummer_sphere
from nbody_streams_tpu.integrate import (init_state, make_accel_fn,
                                         make_kdk_step, run_chunk)
from nbody_streams_tpu.ops.dispatch import DirectGravity
from nbody_streams_tpu.ops.probe import delivered_pallas_tops


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    xv, m = make_plummer_sphere(n, M_total=1e9, a=1.0, seed=2)
    soft = np.full(n, 0.05)
    steps = 5 if n > 500_000 else 50
    print(f"session Pallas fma probe: {delivered_pallas_tops():.2f} Top/s "
          "(best-seen 2.8)", flush=True)
    from nbody_streams_tpu.ops.xla_direct import measure_band_rows

    w = measure_band_rows(xv[:, :3], soft)
    # The drift the slack must absorb is a fixed PHYSICAL width (order
    # staleness x velocities), so in row units it scales ~linearly with
    # N (rows get thinner).  Measured 2026-08-19: +6 rows holds at 64k
    # over 1500+ steps, but both w//4 at 256k (42 rows) and at 1M (138
    # rows) poisoned finite=False — at >=256k the slack that survives
    # is ~the static floor itself, so the measured-band override is a
    # 64k-class (thick-row) optimization and this variant exists to
    # document exactly that boundary.
    mb = {"band_rows": w + max(6, w // 4)}
    todo = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    for impl, extra in (("pallas", {}), ("xla", {}), ("xla-mb", mb)):
        if todo and impl not in todo:
            continue
        s = DirectGravity(m, soft, kernel="spline",
                          precision="float32_kahan",
                          impl=impl.split("-")[0], **extra)
        accel_fn = make_accel_fn(s, s.mass)
        step_fn = make_kdk_step(accel_fn, dt=2e-5, t0=0.0)
        presort = s.spatial_sort_active
        pint = s.presort_interval
        state = init_state(xv[:, :3], xv[:, 3:], accel_fn, s.mass, 0.0,
                           sort_fn=s.sort_key)
        state = run_chunk(step_fn, state, steps, presort=presort,
                          presort_every=pint)
        jax.device_get(state.pos)            # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            state = run_chunk(step_fn, state, steps, presort=presort,
                              presort_every=pint)
            jax.device_get(state.pos)
            best = min(best, (time.perf_counter() - t0) / steps)
        fin = bool(np.isfinite(np.asarray(state.pos)).all())
        print(f"N={n} impl={impl}: {best*1e3:.2f} ms/step  "
              f"{n*n/best/1e9:.1f} Gint/s  finite={fin}", flush=True)


if __name__ == "__main__":
    # supervised child (utils/supervise): the axon tunnel can wedge
    # mid-run — an unsupervised comparison then hangs forever
    # (observed: 20+ min with no output on 2026-08-20)
    from nbody_streams_tpu.utils.supervise import resupervise

    resupervise(__file__)
    main()
