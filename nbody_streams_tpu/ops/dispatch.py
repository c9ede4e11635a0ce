"""Gravity-solver front-end: one object, several interchangeable backends.

``DirectGravity`` packages per-particle mass/softening (device-resident,
correct dtype) with a choice of implementation:

* ``'jnp'``     — blocked pure-jnp oracle (any backend; CPU float64 oracle)
* ``'pallas'``  — Pallas TPU tiled kernel (single chip fast path)
* ``'xla'``     — pure-XLA two-pass split (ops/xla_direct.py): same
  compact-support algorithm as the Pallas path but compiled by XLA, for
  tunnel allocations that penalise Mosaic-compiled kernels
* ``'sharded'`` — shard_map mesh-sharded direct summation (multi chip)
* ``'auto'``    — pallas on TPU, jnp elsewhere; sharded when a mesh with
  more than one device is supplied.

All backends share the same contract: ``accel(pos) -> (N, 3)`` and
``potential(pos) -> (N,)``, jittable, closed over static particle
properties.  This replaces the reference's per-backend compute functions
(reference: fields.py:664,866,1021,1088) with one dispatch point.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import (
    G_DEFAULT,
    PAIRWISE_EPS2,
    validate_kernel,
    validate_precision,
)
from . import pairwise

__all__ = ["DirectGravity"]


# Above this N the Pallas path wins even on a Mosaic-throttled
# allocation: the per-session penalty hits small grids, not sustained
# large kernels.  Measured KDK stepping on the 2026-08-19 degraded
# allocation (Pallas fma probe 0.78 vs 2.8 best-seen Top/s),
# benchmarks/impl_compare.py: 64k XLA 133 vs Pallas 113 Gint/s;
# 256k XLA 161 vs Pallas 109; but 1M Pallas 184 vs XLA 157 — the
# throttle fades with kernel size while the XLA band fraction grows.
# That premise is allocation-class-dependent (a later session measured
# 1M Pallas at 112 on a same-reading probe); for LONG auto-impl runs
# above this cutoff the driver time-trials both backends on the actual
# ICs and keeps the winner (run.py::_timed_impl_trial) — this constant
# only decides the cheap static case.
_XLA_AUTO_MAX_N = 400_000

# target_drift= below this |dE/E| class unfolds the mass from the MXU
# moment matrices (see DirectGravity.__init__): measured 1M/1000-step
# drift ~1e-8 pre-fold vs ~2.1e-7 folded (docs/performance.md gate1m).
_FOLD_MASS_DRIFT = 1e-7


def _default_impl(devices, kernel: str = "spline", n: int = 0) -> str:
    if devices is not None and len(devices) > 1:
        return "sharded"
    # respect an active jax.default_device(...) override (run.py pins
    # architecture='cpu' this way even when a TPU is the default
    # backend — the Pallas kernel must not be selected there)
    dd = jax.config.jax_default_device
    # jax.default_device accepts a Device OR a platform string
    platform = (getattr(dd, "platform", dd) if dd is not None
                else jax.default_backend())
    if platform in ("tpu", "axon"):
        try:
            from . import pallas_direct  # noqa: F401
        except ImportError:
            return "jnp"
        # allocation-aware choice: tunnelled sessions can throttle
        # Mosaic-compiled kernels ~3x while XLA stays at full speed
        # (docs/performance.md) — there the XLA two-pass beats the
        # Pallas configs at small N.  The throttle is N-dependent
        # (large sustained kernels run at full speed even on a degraded
        # allocation), so only small-N sorted-spline populations ever
        # switch.  Probe only when it can matter (the ~0.15 s cached
        # probe is noise against any run at these sizes).
        if pallas_direct.uses_spatial_sort(kernel, n) and n < _XLA_AUTO_MAX_N:
            from .probe import rate_scale

            if rate_scale() < 0.5:
                return "xla"
        return "pallas"
    return "jnp"


class DirectGravity:
    """O(N^2) direct-summation gravity bound to a particle population."""

    def __init__(
        self,
        mass,
        softening,
        G: float = G_DEFAULT,
        kernel: str = "spline",
        precision: str = "float32_kahan",
        impl: str = "auto",
        block_size: int | None = None,
        devices=None,
        eps2: float = PAIRWISE_EPS2,
        sharded_opts: dict | None = None,
        tile_config: dict | None = None,
        band_rows: int | None = None,
        row_size: int | None = None,
        target_block: int | None = None,
        target_drift: float | None = None,
        presort_every: int | None = None,
    ):
        validate_kernel(kernel)
        validate_precision(precision)
        self.kernel = kernel
        self.precision = precision
        self.kahan = precision == "float32_kahan"
        # 'float32_fast': expanded-r2-on-MXU tier of the sorted Pallas
        # path (~half the VPU work per pair; ~1e-4 typical error on
        # smooth profiles, up to ~1e-3 median / ~1e-2 p99 on strongly
        # clustered data — see docs/forces.md); plain float32 everywhere
        # else.  A boundary warning below flags configurations where the
        # tier silently degrades to plain float32.
        self.fast = precision == "float32_fast"
        self.dtype = jnp.float64 if precision == "float64" else jnp.float32
        self.G = float(G)
        self.eps2 = float(eps2)
        self.devices = devices

        if precision == "float64" and not jax.config.jax_enable_x64:
            raise ValueError(
                "precision='float64' needs jax_enable_x64; without it "
                "JAX silently computes in float32 (same check as "
                "compute_forces_direct)")
        mass = jnp.asarray(mass, self.dtype)
        softening = jnp.asarray(softening, self.dtype)
        if mass.ndim == 0:
            raise ValueError("mass must be a per-particle array")
        n = mass.shape[0]

        if impl == "auto":
            impl = _default_impl(devices, kernel, n)
        if impl not in ("jnp", "pallas", "xla", "sharded"):
            raise ValueError(f"Unknown gravity impl {impl!r}")
        if impl in ("pallas", "xla") and precision == "float64":
            impl = "jnp"  # the fast paths are fp32-only by design
        self.impl = impl
        if softening.ndim == 0:
            softening = jnp.full((n,), softening, self.dtype)
        self.n = n
        self.mass = mass
        self.softening = softening
        self.block_size = block_size or pairwise._choose_block(n)
        # the xla backend has its own (larger) default block size; only
        # an explicit user block_size overrides it
        self._user_block_size = block_size
        # tile_config: sorted-Pallas-path tile geometry / moment-pass
        # override (keys: tm, tn, max_sub, mxu, fold_mass) — the
        # per-allocation
        # optimum differs on tunnelled chips, so bench.py auto-tries a
        # small set.  Ignored by the jnp and sharded backends.
        if tile_config is not None:
            bad = set(tile_config) - {"tm", "tn", "max_sub", "mxu",
                                      "fold_mass"}
            if bad:
                raise ValueError(f"unknown tile_config keys: {sorted(bad)}")
        self.tile_config = tile_config
        # target_drift: requested |dE/E| class for a ~1000-step run.
        # Below _FOLD_MASS_DRIFT the mass is automatically unfolded from
        # the MXU moment matrices (tile fold_mass=False): folding gm into
        # the contraction vectors moves one rounding from the per-pair
        # factor into the moment sum, which is harmless at the 1e-7
        # class but was measured to cost ~2e-7 vs ~1e-8 per 1000 steps
        # at N=1M (docs/performance.md 'gate1m'); the pre-fold VPU
        # product restores the tighter behaviour at ~1/3 more VPU work
        # per pair in the base pass.  Mirrors the reference's Kahan
        # accuracy contract (reference: cuda_kernels.py:281-355).
        if target_drift is not None:
            target_drift = float(target_drift)
            if not target_drift > 0.0:
                raise ValueError("target_drift must be a positive |dE/E| "
                                 f"bound (got {target_drift!r})")
            if (target_drift < _FOLD_MASS_DRIFT
                    and impl == "pallas" and not self.fast):
                tc = dict(self.tile_config or {})
                # an explicit user fold_mass wins over the automatic one
                tc.setdefault("fold_mass", False)
                self.tile_config = tc
        self.target_drift = target_drift
        # band_rows: measured-width band provisioning for the XLA
        # two-pass backend (ops/xla_direct.py measure_band_rows) — an
        # expert knob the bench's measured-band trial configs use; the
        # static _nb_rows floor remains the default.  Other backends
        # have no band bookkeeping to override.
        if band_rows is not None and impl != "xla":
            raise ValueError(
                f"band_rows= only applies to impl='xla' (got {impl!r}); "
                "the Pallas path sizes its band from a static ladder")
        self.band_rows = band_rows
        # row_size: XLA-backend band bookkeeping granularity (finer rows
        # = tighter windows = fewer surplus band pairs; see
        # xla_direct._dispatch).  The Pallas path's band granularity is
        # its tn tile width (tile_config).
        if row_size is not None and impl != "xla":
            raise ValueError(
                f"row_size= only applies to impl='xla' (got {impl!r}); "
                "use tile_config= for the Pallas path's geometry")
        self.row_size = row_size
        # target_block: XLA-backend band-window granularity — smaller
        # target tiles hug the near-pair set tighter, shrinking the
        # band pass (xla_direct._xla_self_sorted tbs).
        if target_block is not None and impl != "xla":
            raise ValueError(
                f"target_block= only applies to impl='xla' (got {impl!r}); "
                "use tile_config= for the Pallas path's geometry")
        self.target_block = target_block
        # presort_every: override the XLA backend's in-scan order
        # refresh cadence (default 10 steps).  The in-graph argsort is
        # the dominant stepping-vs-eval overhead at 64k (~1.5-2 ms/step
        # amortised at cadence 10); a band provisioned with a wide
        # measured cushion tolerates more staleness, so benchers can
        # stretch the cadence.  A cadence too long for the cushion
        # poisons with NaN (exact-or-NaN guard) — never silently wrong.
        if presort_every is not None:
            if impl != "xla":
                raise ValueError(
                    f"presort_every= only applies to impl='xla' "
                    f"(got {impl!r}); the Pallas path's stale-order "
                    "behaviour is exact-with-fallback at any cadence")
            if int(presort_every) < 1:
                raise ValueError(
                    f"presort_every must be >= 1, got {presort_every!r}")
        self.presort_every = (None if presort_every is None
                              else int(presort_every))

        if self.fast:
            # the fast tier only exists on the slab-sorted Pallas spline
            # path; everywhere else it silently IS plain float32 — warn so
            # the user does not believe they bought a speedup (or an
            # accuracy contract) they are not getting
            from .pallas_direct import uses_spatial_sort

            if self.impl != "pallas" or not uses_spatial_sort(kernel, n):
                import warnings

                from ..species import PerformanceWarning

                why = (f"impl={self.impl!r}" if self.impl != "pallas"
                       else f"kernel={kernel!r}, N={n:,}")
                warnings.warn(
                    "precision='float32_fast' only accelerates the "
                    "slab-sorted Pallas spline path (impl='pallas', "
                    f"kernel='spline', N >= 16384); with {why} it runs "
                    "as plain 'float32'", PerformanceWarning, stacklevel=2)
            if tile_config is not None and tile_config.get("mxu") is False:
                # fail at construction, not at trace time deep inside
                # the kernel (pallas_direct raises the same conflict)
                raise ValueError(
                    "precision='float32_fast' builds r^2 on the MXU "
                    "moment path; tile_config {'mxu': False} conflicts "
                    "with it")

        if self.impl == "sharded":
            from ..parallel.sharded import ShardedDirect

            # sharded_opts forwards ShardedDirect kwargs (mesh=,
            # use_pallas=, interpret=) — e.g. use_pallas=True,
            # interpret=True runs the Pallas ring branch on a CPU mesh
            self._sharded = ShardedDirect(self, **(sharded_opts or {}))
        elif sharded_opts:
            raise ValueError(
                f"sharded_opts given but impl resolved to {impl!r}; pass "
                "impl='sharded' (impl='auto' only selects the sharded "
                "backend when devices= has more than one device)")

    def shard_state(self, tree):
        """Block-shard (N, ...) state arrays over the particle mesh.

        A no-op for the single-device backends.  For ``impl='sharded'``
        this places the integrator state with the same sharding the ring
        body expects, so scanned KDK steps run fully sharded instead of
        paying an XLA reshard per force call."""
        if self.impl == "sharded":
            return self._sharded.shard_state(tree)
        return tree

    @property
    def state_pad(self) -> int:
        """Ghost rows the sharded backend appends to make N divisible by
        the device count (0 for the single-device backends and for even
        N).  Ghosts are zero-mass, so they are invisible to forces and
        to every mass-weighted diagnostic; the run_nbody driver freezes
        them and strips them from all host-visible output."""
        if self.impl == "sharded":
            return self._sharded.npad - self.n
        return 0

    def _check_pos(self, pos):
        ok = {(self.n, 3), (self.n + self.state_pad, 3)}
        if pos.ndim != 2 or tuple(pos.shape) not in ok:
            raise ValueError(
                f"pos shape {pos.shape} does not match the solver's "
                f"({self.n}, 3) particle population")

    # -- spatial-sort order reuse --------------------------------------------
    @property
    def spatial_sort_active(self) -> bool:
        """True when accel/potential take a slab-sorted two-pass path
        (Pallas or XLA) and therefore accept a reusable ``order=`` (the
        integrator re-sorts once per scanned chunk instead of per force
        call)."""
        if self.impl in ("pallas", "xla"):
            # both backends share the Pallas predicate (xla_direct
            # delegates to it)
            from . import pallas_direct

            return pallas_direct.uses_spatial_sort(self.kernel, self.n)
        return False

    def sort_key(self, pos):
        """The slab order accel/potential would compute internally."""
        from . import pallas_direct

        return pallas_direct.slab_sort_key(pos)

    @property
    def presort_interval(self):
        """In-scan order refresh cadence for ``run_chunk``.

        The XLA backend's in-scan guard is exact-or-NaN with a finite
        band slack (ops/xla_direct.py); the slack absorbs only a few
        band-rows of drift, so its order must be refreshed every ~10
        steps (in-graph argsort, ~0.3 ms/step amortised at 64k).  The
        Pallas path's stale-order behaviour is exact-with-fallback, so
        it keeps the cheaper once-per-chunk sort.  ``presort_every=``
        overrides the default cadence (see __init__)."""
        if self.impl == "xla" and self.spatial_sort_active:
            return self.presort_every or 10
        return None

    # -- backend dispatch ---------------------------------------------------
    def accel(self, pos, order=None):
        """Softened gravitational acceleration, (N, 3) in solver dtype.

        ``order`` optionally supplies a precomputed (possibly stale) slab
        order for the sorted Pallas path — exact for any permutation;
        ignored by the other backends."""
        self._check_pos(pos)
        pos = pos.astype(self.dtype)
        if self.impl == "pallas":
            from . import pallas_direct

            return pallas_direct.pallas_accel(
                pos, self.mass, self.softening, self.G, self.kernel,
                self.kahan, self.eps2, order=order, fast=self.fast,
                tile=self.tile_config,
            )
        if self.impl == "xla":
            from . import xla_direct

            return xla_direct.xla_accel(
                pos, self.mass, self.softening, self.G, self.kernel,
                self.kahan, self.eps2, order=order,
                block_size=self._user_block_size,
                band_rows=self.band_rows, row_size=self.row_size,
                target_block=self.target_block,
            )
        if self.impl == "sharded":
            return self._sharded.accel(pos)
        return pairwise._pairwise_blocked(
            pos, self.mass, self.softening, jnp.asarray(self.G, self.dtype),
            self.kernel, self.kahan, self.block_size, "acc", self.eps2,
        )

    def potential(self, pos, order=None):
        """Softened gravitational potential per particle, (N,)."""
        self._check_pos(pos)
        pos = pos.astype(self.dtype)
        if self.impl == "pallas":
            from . import pallas_direct

            return pallas_direct.pallas_potential(
                pos, self.mass, self.softening, self.G, self.kernel,
                self.kahan, self.eps2, order=order, fast=self.fast,
                tile=self.tile_config,
            )
        if self.impl == "xla":
            from . import xla_direct

            return xla_direct.xla_potential(
                pos, self.mass, self.softening, self.G, self.kernel,
                self.kahan, self.eps2, order=order,
                block_size=self._user_block_size,
                band_rows=self.band_rows, row_size=self.row_size,
                target_block=self.target_block,
            )
        if self.impl == "sharded":
            return self._sharded.potential(pos)
        return pairwise._pairwise_blocked(
            pos, self.mass, self.softening, jnp.asarray(self.G, self.dtype),
            self.kernel, self.kahan, self.block_size, "pot", self.eps2,
        )
