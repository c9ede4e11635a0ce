"""Pallas TPU kernel for O(N^2) all-pairs forces and potentials.

TPU-native replacement for the reference's shared-memory-tiled CUDA kernels
(reference: cuda_kernels.py:18-180 — 128-wide float4 tiles, per-thread
accumulators, Kahan variants).  Design mapping:

CUDA concept                      ->  Pallas/TPU concept
---------------------------------------------------------------------------
one thread per target particle    ->  one grid step per TM-target tile,
                                      vectorised over the 8x128 VPU
shared-memory 128-source tile     ->  (SUB, TN) source *superblock* staged
                                      into VMEM by the Pallas pipeline
                                      (auto double-buffered), swept in
                                      TN-wide sub-tiles
per-thread Kahan compensation     ->  fp32 tree-reduction within each
                                      (TM, TN) tile + two-sum compensated
                                      accumulation across superblocks in a
                                      VMEM scratch accumulator
branch-free `not_self` multiply   ->  *no mask at all* in force mode: the
                                      self pair has dx == 0 exactly and
                                      eps2 > 0 keeps w finite, so its
                                      contribution is identically zero.
                                      Potential mode subtracts the
                                      closed-form self term u(eps2, h_i)
                                      outside the kernel.
float4 AoS packing                ->  SoA lane-aligned layout: targets as
                                      (N, 1) columns, sources as
                                      (N/TN, TN) row-blocks

The grid is (targets/TM, sources/SUPER) with the source dimension
innermost: the output tile is revisited across it, staying resident in
VMEM, and the Python-unrolled loop over SUB sub-tiles amortises grid-step
overhead.  Targets and sources are independent argument sets so the same
kernel serves the single-chip path (targets == sources) and the
mesh-sharded ring path (local targets x ring-permuted source block, see
parallel/sharded.py).

Masses arrive pre-multiplied by G.  Pair rule ``h_eff = max(h_i, h_j)``
and ``eps2`` regularisation match the reference and ops/pairwise.py (the
test oracle for this file).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import PAIRWISE_EPS2
from .kernels import force_factor, potential_factor  # noqa: F401 (oracle refs)

# Per-pair softening via precomputed per-particle quantities:
# h_eff = max(h_i, h_j)  <=>  h2_eff = max(h_i^2, h_j^2)
#                        <=>  hinv_eff = min(1/h_i, 1/h_j)  (h >= 0),
# so the kernels below receive h^2 (plummer/dehnen) or 1/h (spline)
# directly and never re-derive them per pair (saves one rsqrt per pair
# in the spline kernel — ~10% of its op budget).


def _force_pre(kind, r2, pre):
    """force_factor with the precomputed pair quantity `pre`."""
    if kind == "plummer":
        d = r2 + pre
        inv = jax.lax.rsqrt(d)
        return inv * inv * inv
    if kind == "dehnen_k1":
        d = r2 + pre
        inv = jax.lax.rsqrt(d)
        inv_d = inv * inv
        inv_d32 = inv_d * inv
        return inv_d32 + 1.5 * pre * (inv_d32 * inv_d)
    if kind == "dehnen_k2":
        d = r2 + pre
        inv = jax.lax.rsqrt(d)
        inv_d = inv * inv
        inv_d32 = inv_d * inv
        inv_d52 = inv_d32 * inv_d
        return (inv_d32 + 1.5 * pre * inv_d52
                + 3.75 * (pre * pre) * (inv_d52 * inv_d))
    if kind == "newtonian":
        inv = jax.lax.rsqrt(r2)
        return inv * inv * inv
    if kind == "spline":
        # pre = 1/h (inf for h == 0)
        inv_r = jax.lax.rsqrt(r2)
        r = r2 * inv_r
        newton = inv_r * inv_r * inv_r
        hinv = pre
        h3inv = hinv * hinv * hinv
        q = r * hinv
        q2 = q * q
        # no q ~ 0 special case: eps2 > 0 keeps q finite and the inner
        # polynomial evaluates to the exact centre value h3inv * 32/3
        # as q -> 0 (saves a select + constant load per pair)
        inner = h3inv * (q2 * (32.0 * q - 38.4) + 10.666666666666666)
        outer = h3inv * (
            21.333333333333333
            + q * (-48.0 + q * (38.4 - 10.666666666666667 * q))
        ) - 0.0666666666666667 * newton
        soft = jnp.where(q <= 0.5, inner, outer)
        return jnp.where(q >= 1.0, newton, soft)
    raise ValueError(kind)


def _pot_pre(kind, r2, pre):
    """potential_factor with the precomputed pair quantity `pre`."""
    if kind == "plummer":
        return -jax.lax.rsqrt(r2 + pre)
    if kind == "dehnen_k1":
        d = r2 + pre
        inv = jax.lax.rsqrt(d)
        inv_d32 = inv * inv * inv
        return -inv - 0.5 * pre * inv_d32
    if kind == "dehnen_k2":
        d = r2 + pre
        inv = jax.lax.rsqrt(d)
        inv_d32 = inv * inv * inv
        inv_d52 = inv_d32 * inv * inv
        return -inv - 0.5 * pre * inv_d32 - 0.375 * (pre * pre) * inv_d52
    if kind == "newtonian":
        return -jax.lax.rsqrt(r2)
    if kind == "spline":
        inv_r = jax.lax.rsqrt(r2)
        r = r2 * inv_r
        newton = -inv_r
        hinv = pre
        q = r * hinv
        q2 = q * q
        # no q ~ 0 special case: the inner polynomial tends to the exact
        # centre value -2.8 * hinv as q -> 0.  q2 nesting (not the
        # reference's q4 — see ops/kernels.py note): this is the true
        # antiderivative of the force kernel.
        inner = (-2.8 + q2 * (5.333333333333333
                              + q2 * (6.4 * q - 9.6))) * hinv
        outer = (
            -3.2
            + q2 * (10.666666666666666
                    + q * (-16.0 + q * (9.6 - 2.1333333333333333 * q)))
        ) * hinv + 0.06666666666666667 * inv_r
        soft = jnp.where(q <= 0.5, inner, outer)
        return jnp.where(q >= 1.0, newton, soft)
    raise ValueError(kind)

__all__ = ["pallas_accel", "pallas_potential", "pallas_accel_2set",
           "pallas_potential_2set"]

# Default tile geometry (tuned on TPU v5e; benchmarks/tile_sweep.py).
# Under the MXU moment base pass (round 3) 512/512/16 wins at both
# scales: 181.9 Gint/s @64k, 220.0 @1M (vs 180.5/218.4 for 256/512/32;
# 128/512/32 — the pre-MXU winner — trails by ~5%).  512/512/32 and
# 1024-wide tiles fail to compile (VMEM).
TM = 512        # targets per grid step
TN = 512        # source sub-tile width (lanes)
MAX_SUB = 16    # sub-tiles per source superblock


def _mask_self_lanes(s, iglob, src_row0, tn):
    """Zero the s_ii lanes when the target block IS the source block
    (global row orderings aligned).  The VPU s*dx form needs no self
    mask (dx_ii == 0 kills the term), but the MXU moment and row-sum
    forms accumulate s_ii ~ 1/eps2^1.5 directly, which wrecks the
    fp32 sums long before any finalisation could cancel it.
    ``src_row0`` is the global row index of the source tile's first
    lane."""
    jglob = src_row0 + jax.lax.broadcasted_iota(jnp.int32, (1, tn), 1)
    return jnp.where(iglob == jglob, 0.0, s)


def _tile_sum(kind, mode, mask_self, eps2, tm, tn, n_sub,
              xt, yt, zt, ht, iglob,
              xs_ref, ys_ref, zs_ref, ms_ref, hs_ref, k, jb,
              mxu=False, mxu_r2=None, fold_mass=True):
    """One (TM targets) x (TN sources) tile reduction: (tm, width).

    With ``mxu=True`` (acc mode) the tile returns the un-finalised
    (tm, 4) moments ``S @ [xs ys zs 1]^T`` computed on the MXU instead
    of VPU lane reductions of ``s * dx`` — the caller must finalise
    ``acc = P[:, :3] - pos_t * P[:, 3:]`` once per target after all
    tiles are accumulated (sum_j s_ij (x_j - x_i) is linear, so the
    rewrite is exact up to fp32 rounding of the two moment sums).

    Every MXU contraction here carries ``precision=HIGHEST``: the v5e
    systolic array multiplies fp32 operands as single-pass bf16 by
    default (``preferred_element_type`` only sets the accumulator),
    which truncates the force factors to 8 mantissa bits — measured
    5.6e-3 max / 4.7e-4 median relative force error at N=16k on
    hardware before the fix, invisible to CPU interpret tests.  The
    moment contraction is a few % of tile FLOPs, so the 6-pass fp32
    decomposition costs ~nothing (measured same-session below).

    ``mxu_r2`` (the ``float32_fast`` tier, requires ``mxu``) moves the
    r^2 construction onto the MXU too, via the expanded form
    ``r^2 = |x_t|^2 + |x_s|^2 - 2 x_t . x_s`` — the cross term is a
    (tm, 3) @ (3, tn) contraction on the systolic array, cutting the
    VPU work per pair roughly in half (9 ops of dx/dy/dz/r2 chain
    become 3).  The expansion cancels catastrophically when
    r << |x|, so it is a reduced-accuracy tier: with centred
    coordinates the r^2 error is ~eps_f32 * |x|^2, i.e. relative
    error ~eps_f32 * (|x| / r)^2 per pair (the sorted two-pass path
    bounds r >= max h for every pair this form sees, giving ~1e-4
    worst-case at h = 0.05, extent ~ 5).  The self pair can round to
    r^2 <= 0; the eps2 clamp keeps the kernel finite (the banded
    window that contains it is zeroed afterwards, so the huge-but-
    finite self factor never leaks into results)."""
    xs = xs_ref[k:k + 1, :]     # (1, TN)
    ys = ys_ref[k:k + 1, :]
    zs = zs_ref[k:k + 1, :]
    gms = ms_ref[k:k + 1, :]
    if mxu_r2 is not None:
        t3, a_t = mxu_r2        # (tm, 3) coords, (tm, 1) |x_t|^2 + eps2
        s3 = jnp.concatenate([xs, ys, zs], axis=0)          # (3, TN)
        cross = jax.lax.dot_general(
            t3, s3, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)              # (tm, TN)
        b_s = xs * xs + (ys * ys + zs * zs)                  # (1, TN)
        # clamp by the exact bound r^2 >= dx_x^2 (+eps2): the expansion's
        # absolute error ~eps_f32 * |x|^2 can round a genuinely small
        # r^2 to <= 0 for pairs involving far outliers (|x| ~ 100s);
        # the x-separation bound is cancellation-free and, on the
        # sorted path, > h_max^2 for every out-of-band pair — so the
        # clamp can never produce a divergent factor
        dxx = xs - xt
        r2 = jnp.maximum(a_t + (b_s - 2.0 * cross),
                         dxx * dxx + eps2)
        dx = dy = dz = None      # acc requires mxu: moments never need dx
    else:
        dx = xs - xt
        dy = ys - yt
        dz = zs - zt
        # fma-chained with eps2 folded into the innermost term
        r2 = dx * dx + (dy * dy + (dz * dz + eps2))
    if kind == "newtonian":
        pre = r2                 # unused
    elif kind == "spline":
        # pair softening combine: hinv_eff = min (1/h inputs)
        pre = jnp.minimum(ht, hs_ref[k:k + 1, :])
    else:
        # h2_eff = max (h^2 inputs) for plummer/dehnen
        pre = jnp.maximum(ht, hs_ref[k:k + 1, :])
    if mode == "acc":
        if mxu:
            # fold the mass into the moment matrix: s = f only (saves
            # one VPU multiply per pair) and b = gm * [xs ys zs 1] —
            # the 4 per-source-lane multiplies amortise over the tm
            # targets of the tile (4/tm ops per pair).  Exact same sum,
            # one rounding moved from the pair factor into the matrix.
            # ``fold_mass=False`` (the target_drift tier, dispatch.py)
            # keeps the gm*f product on the VPU per pair instead —
            # the pre-fold formulation whose 1M/1000-step drift was
            # pinned at ~1e-8 (docs/performance.md north-star gates).
            s = _force_pre(kind, r2, pre)
            if not fold_mass:
                s = gms * s
            if mask_self:
                s = _mask_self_lanes(s, iglob, jb * (n_sub * tn) + k * tn,
                                     tn)
            if fold_mass:
                b = jnp.concatenate(
                    [gms * xs, gms * ys, gms * zs, gms], axis=0)  # (4, TN)
            else:
                b = jnp.concatenate(
                    [xs, ys, zs, jnp.ones_like(xs)], axis=0)      # (4, TN)
            return jax.lax.dot_general(
                s, b, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)          # (tm, 4)
        s = gms * _force_pre(kind, r2, pre)
        ax = jnp.sum(s * dx, axis=1, keepdims=True)
        ay = jnp.sum(s * dy, axis=1, keepdims=True)
        az = jnp.sum(s * dz, axis=1, keepdims=True)
        return jnp.concatenate([ax, ay, az], axis=1)
    if mxu:
        # phi_i = sum_j s_ij is a plain row sum: run it on the
        # (otherwise idle) MXU instead of VPU cross-lane reductions —
        # same trick as the acc moments, but with a single moment and
        # no finalisation (and no centring for the non-fast tier: no
        # coordinate products, so no cancellation to bound).  The mass
        # folds into the contraction vector (S @ gm), saving the VPU
        # multiply per pair exactly as in acc mode; ``fold_mass=False``
        # multiplies it per pair on the VPU instead (target_drift tier).
        s = _pot_pre(kind, r2, pre)
        vec = gms
        if not fold_mass:
            s = gms * s
            vec = jnp.ones_like(gms)
        if mask_self:
            s = _mask_self_lanes(s, iglob, jb * (n_sub * tn) + k * tn, tn)
        return jax.lax.dot_general(
            s, vec, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)               # (tm, 1)
    s = gms * _pot_pre(kind, r2, pre)
    if mask_self:
        s = _mask_self_lanes(s, iglob, jb * (n_sub * tn) + k * tn, tn)
    return jnp.sum(s, axis=1, keepdims=True)


def _direct_kernel(*refs, kind, kahan, eps2, tm, tn, n_sub, mode,
                   mask_self, skip_band=0, mxu=False, mxu_r2=False,
                   fold_mass=True):
    """All-pairs tile kernel.  With ``skip_band > 0`` the first ref is a
    scalar-prefetched (n_i,) row-start array and the contribution of
    source rows [start[i], start[i] + skip_band) is zeroed (those pairs
    are handled by the full-softening band pass; the zeroing is one
    scalar multiply per tile — per-tile conditionals cannot skip vector
    work on the VPU, but a scalar factor is free)."""
    if skip_band:
        (start_ref, xt_ref, yt_ref, zt_ref, ht_ref,
         xs_ref, ys_ref, zs_ref, ms_ref, hs_ref, out_ref,
         comp_ref) = refs
    else:
        (xt_ref, yt_ref, zt_ref, ht_ref,
         xs_ref, ys_ref, zs_ref, ms_ref, hs_ref, out_ref,
         comp_ref) = refs
    i = pl.program_id(0)
    jb = pl.program_id(1)

    @pl.when(jb == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
        if kahan:
            comp_ref[:] = jnp.zeros_like(comp_ref)

    xt = xt_ref[:]              # (TM, 1)
    yt = yt_ref[:]
    zt = zt_ref[:]
    ht = ht_ref[:]
    iglob = None
    if mask_self:
        from jax import lax as _lax

        iglob = i * tm + _lax.broadcasted_iota(jnp.int32, (tm, 1), 0)

    r2_pre = None
    if mxu_r2:
        # hoisted once per grid step: target coords as a (tm, 3) block
        # for the MXU cross term, and |x_t|^2 + eps2
        t3 = jnp.concatenate([xt, yt, zt], axis=1)
        a_t = xt * xt + (yt * yt + (zt * zt + eps2))
        r2_pre = (t3, a_t)

    width = (4 if mxu else 3) if mode == "acc" else 1
    partial = jnp.zeros((tm, width), jnp.float32)
    for k in range(n_sub):
        tile = _tile_sum(
            kind, mode, mask_self, eps2, tm, tn, n_sub,
            xt, yt, zt, ht, iglob,
            xs_ref, ys_ref, zs_ref, ms_ref, hs_ref, k, jb, mxu=mxu,
            mxu_r2=r2_pre, fold_mass=fold_mass)
        if skip_band:
            row = jb * n_sub + k
            outside = jnp.logical_or(row < start_ref[i],
                                     row >= start_ref[i] + skip_band)
            tile = tile * outside.astype(jnp.float32)
        partial = partial + tile

    if kahan:
        # Two-sum compensated accumulation across superblocks.
        y = partial - comp_ref[:]
        t = out_ref[:] + y
        comp_ref[:] = (t - out_ref[:]) - y
        out_ref[:] = t
    else:
        out_ref[:] = out_ref[:] + partial


def _pad1(a, npad):
    return jnp.pad(a, ((0, npad - a.shape[0]),))


def _soft_pre(kind, h):
    """Per-particle precomputed softening quantity (see _force_pre)."""
    if kind == "spline":
        return jnp.where(h > 0, 1.0 / h, jnp.inf)
    return h * h


@functools.partial(
    jax.jit,
    static_argnames=("kind", "kahan", "mode", "eps2", "tm", "tn", "max_sub",
                     "interpret", "mask_self", "skip_band", "mxu", "mxu_r2",
                     "fold_mass"),
)
def _pallas_direct(pos_t, soft_t, pos_s, gmass_s, soft_s,
                   kind, kahan, mode, eps2,
                   tm=TM, tn=TN, max_sub=MAX_SUB, interpret=False,
                   mask_self=False, skip_band=0, band_start=None,
                   mxu=False, mxu_r2=False, fold_mass=True):
    if mxu_r2 and mode == "acc" and not mxu:
        raise ValueError("mxu_r2 acceleration requires the MXU moment "
                         "path (mxu=True): the expanded-r2 tile never "
                         "materialises dx/dy/dz")
    soft_t = _soft_pre(kind, soft_t)
    soft_s = _soft_pre(kind, soft_s)
    nt = pos_t.shape[0]
    ns = pos_s.shape[0]
    n_sub = max(1, min(max_sub, -(-ns // tn)))
    superb = tn * n_sub
    nt_pad = -(-nt // tm) * tm
    ns_pad = -(-ns // superb) * superb
    n_i = nt_pad // tm
    n_jb = ns_pad // superb

    xt = _pad1(pos_t[:, 0], nt_pad).reshape(nt_pad, 1)
    yt = _pad1(pos_t[:, 1], nt_pad).reshape(nt_pad, 1)
    zt = _pad1(pos_t[:, 2], nt_pad).reshape(nt_pad, 1)
    ht = _pad1(soft_t, nt_pad).reshape(nt_pad, 1)

    rows = ns_pad // tn
    xs = _pad1(pos_s[:, 0], ns_pad).reshape(rows, tn)
    ys = _pad1(pos_s[:, 1], ns_pad).reshape(rows, tn)
    zs = _pad1(pos_s[:, 2], ns_pad).reshape(rows, tn)
    ms = _pad1(gmass_s, ns_pad).reshape(rows, tn)
    hs = _pad1(soft_s, ns_pad).reshape(rows, tn)

    width = (4 if mxu else 3) if mode == "acc" else 1
    t_spec = pl.BlockSpec((tm, 1), lambda i, jb: (i, 0),
                          memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((n_sub, tn), lambda i, jb: (jb, 0),
                          memory_space=pltpu.VMEM)
    # Trace the kernel with x64 disabled: every value here is explicitly
    # f32/i32, but global x64 mode leaks an i64 grid temporary into the
    # Mosaic lowering ('failed to legalize func.return (i32, i64)').
    with jax.enable_x64(False):
        if skip_band:
            kernel = functools.partial(
                _direct_kernel, kind=kind, kahan=kahan, eps2=eps2,
                tm=tm, tn=tn, n_sub=n_sub, mode=mode, mask_self=mask_self,
                skip_band=skip_band, mxu=mxu, mxu_r2=mxu_r2,
                fold_mass=fold_mass,
            )
            ts2 = pl.BlockSpec((tm, 1), lambda i, jb, s_ref: (i, 0),
                               memory_space=pltpu.VMEM)
            ss2 = pl.BlockSpec((n_sub, tn), lambda i, jb, s_ref: (jb, 0),
                               memory_space=pltpu.VMEM)
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_i, n_jb),
                in_specs=[ts2, ts2, ts2, ts2,
                          ss2, ss2, ss2, ss2, ss2],
                out_specs=pl.BlockSpec((tm, width),
                                       lambda i, jb, s_ref: (i, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((tm, width), jnp.float32)],
            )
            out = pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((nt_pad, width),
                                               jnp.float32),
                interpret=interpret,
            )(band_start.astype(jnp.int32), xt, yt, zt, ht,
              xs, ys, zs, ms, hs)
        else:
            kernel = functools.partial(
                _direct_kernel, kind=kind, kahan=kahan, eps2=eps2, tm=tm,
                tn=tn, n_sub=n_sub, mode=mode, mask_self=mask_self,
                mxu=mxu, mxu_r2=mxu_r2, fold_mass=fold_mass,
            )
            out = _call_kernel(kernel, n_i, n_jb, t_spec, s_spec, tm,
                               width, nt_pad, ns_pad, n_sub, tn, interpret,
                               xt, yt, zt, ht, xs, ys, zs, ms, hs)
    out = out[:nt]
    if mxu and mode == "acc":
        # finalise the MXU moments: acc_i = P[:3] - x_i * P[3]
        out = out[:, :3] - pos_t * out[:, 3:4]
    return out if mode == "acc" else out[:, 0]


def _call_kernel(kernel, n_i, n_jb, t_spec, s_spec, tm, width, nt_pad,
                 ns_pad, n_sub, tn, interpret,
                 xt, yt, zt, ht, xs, ys, zs, ms, hs):
    return pl.pallas_call(
        kernel,
        grid=(n_i, n_jb),
        in_specs=[t_spec, t_spec, t_spec, t_spec,
                  s_spec, s_spec, s_spec, s_spec, s_spec],
        out_specs=pl.BlockSpec((tm, width), lambda i, jb: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nt_pad, width), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tm, width), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=25 * nt_pad * ns_pad,
            bytes_accessed=ns_pad * 5 * 4 * n_i + nt_pad * (width + 4) * 4,
            transcendentals=nt_pad * ns_pad,
        ),
        interpret=interpret,
    )(xt, yt, zt, ht, xs, ys, zs, ms, hs)


def _band_kernel(start_ref, xt_ref, yt_ref, zt_ref, ht_ref,
                 xs_ref, ys_ref, zs_ref, ms_ref, hs_ref, out_ref,
                 comp_ref, *, eps2, tm, tn, mode, mask_self, kahan,
                 mxu=False):
    """Full spline evaluation over each target tile's banded source
    window [start[i], start[i] + n_band) — the rows the Newtonian base
    pass zeroed out.  Each pair is evaluated exactly once across the
    two passes, so there is no cancellation between them.  With
    ``kahan`` the per-grid-step accumulation across band rows is
    two-sum compensated (close pairs dominate the force — they must
    not get plain fp32 summation while the base pass compensates)."""
    i = pl.program_id(0)
    b = pl.program_id(1)

    @pl.when(b == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
        comp_ref[:] = jnp.zeros_like(comp_ref)

    def _accum(delta):
        if kahan:
            y = delta - comp_ref[:]
            t = out_ref[:] + y
            comp_ref[:] = (t - out_ref[:]) - y
            out_ref[:] = t
        else:
            out_ref[:] = out_ref[:] + delta

    xt = xt_ref[:]
    yt = yt_ref[:]
    zt = zt_ref[:]
    ht = ht_ref[:]
    xs = xs_ref[0, 0:1, :]
    ys = ys_ref[0, 0:1, :]
    zs = zs_ref[0, 0:1, :]
    gms = ms_ref[0, 0:1, :]
    hs = hs_ref[0, 0:1, :]
    dx = xs - xt
    dy = ys - yt
    dz = zs - zt
    r2 = dx * dx + (dy * dy + (dz * dz + eps2))
    pre = jnp.minimum(ht, hs)
    if mode == "acc":
        # stays on the VPU deliberately: the band holds the NEAR pairs,
        # where the moment form's s*x vs x_t*s cancellation is maximal
        # (|x|/|dx| ~ 100) — measured 30x accuracy loss when tried.
        # The s*dx products have no cancellation.
        s = gms * _force_pre("spline", r2, pre)
        ax = jnp.sum(s * dx, axis=1, keepdims=True)
        ay = jnp.sum(s * dy, axis=1, keepdims=True)
        az = jnp.sum(s * dz, axis=1, keepdims=True)
        _accum(jnp.concatenate([ax, ay, az], axis=1))
    else:
        s = gms * _pot_pre("spline", r2, pre)
        if mask_self:
            iglob = i * tm + jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0)
            s = _mask_self_lanes(s, iglob, (start_ref[i] + b) * tn, tn)
        if mxu:
            _accum(jax.lax.dot_general(
                s, jnp.ones_like(xs), (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32))          # (tm, 1)
        else:
            _accum(jnp.sum(s, axis=1, keepdims=True))


@functools.partial(
    jax.jit,
    static_argnames=("mode", "eps2", "tm", "tn", "n_band", "interpret",
                     "mask_self", "kahan", "mxu"),
)
def _pallas_band_correction(pos, gmass, hinv, start, mode, eps2,
                            tm, tn, n_band, interpret=False,
                            mask_self=False, kahan=False, mxu=False):
    """Banded (N x n_band*tn) spline-correction pass; ``start`` gives
    each target tile's first source row (scalar-prefetched into the
    BlockSpec index maps).  ``mxu`` moves the pot row sum onto the MXU
    (acc stays VPU: the band's near pairs have maximal moment
    cancellation — see _band_kernel)."""
    nt = pos.shape[0]
    nt_pad = -(-nt // tm) * tm
    ns_pad = -(-nt // tn) * tn
    n_i = nt_pad // tm
    rows = ns_pad // tn

    xt = _pad1(pos[:, 0], nt_pad).reshape(nt_pad, 1)
    yt = _pad1(pos[:, 1], nt_pad).reshape(nt_pad, 1)
    zt = _pad1(pos[:, 2], nt_pad).reshape(nt_pad, 1)
    ht = _pad1(hinv, nt_pad).reshape(nt_pad, 1)
    # sources as (rows, 1, tn): Mosaic requires the last two block dims
    # divisible by (8, 128) or equal to the array dims — a (1, 1, tn)
    # block of a 3-D array satisfies that where a (1, tn) block cannot
    xs = _pad1(pos[:, 0], ns_pad).reshape(rows, 1, tn)
    ys = _pad1(pos[:, 1], ns_pad).reshape(rows, 1, tn)
    zs = _pad1(pos[:, 2], ns_pad).reshape(rows, 1, tn)
    ms = _pad1(gmass, ns_pad).reshape(rows, 1, tn)
    hs = _pad1(hinv, ns_pad).reshape(rows, 1, tn)

    width = 3 if mode == "acc" else 1
    kernel = functools.partial(
        _band_kernel, eps2=eps2, tm=tm, tn=tn, mode=mode,
        mask_self=mask_self, kahan=kahan, mxu=mxu and mode == "pot",
    )
    t_spec = pl.BlockSpec((tm, 1), lambda i, b, s_ref: (i, 0),
                          memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((1, 1, tn),
                          lambda i, b, s_ref: (s_ref[i] + b, 0, 0),
                          memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_i, n_band),
            in_specs=[t_spec, t_spec, t_spec, t_spec,
                      s_spec, s_spec, s_spec, s_spec, s_spec],
            out_specs=[pl.BlockSpec((tm, width),
                                    lambda i, b, s_ref: (i, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((tm, width),
                                    lambda i, b, s_ref: (i, 0),
                                    memory_space=pltpu.VMEM)],
        )
        out, _comp = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((nt_pad, width), jnp.float32),
                       jax.ShapeDtypeStruct((nt_pad, width), jnp.float32)],
            interpret=interpret,
        )(start.astype(jnp.int32), xt, yt, zt, ht, xs, ys, zs, ms, hs)
    out = out[:nt]
    return out if mode == "acc" else out[:, 0]


# MXU moment rewrite of the two-pass base kernel (see _tile_sum mxu=):
# the s*dx lane reductions move onto the otherwise-idle MXU, cutting the
# VPU work per pair by ~1/3.  Off for interpret / explicitly per call.
MXU_BASE = True


def _pallas_self_sorted(pos, gmass, soft, kind, kahan, mode, eps2,
                        interpret=False, tm=None, tn=None, max_sub=None,
                        mxu=None, order=None, fast=False, fold_mass=True):
    """Self-gravity via slab sort + the compact-support two-pass split.

    Pass 1 runs the cheap (~16-op) Newtonian kernel over all pairs,
    zeroing each target tile's banded source window; pass 2 evaluates
    the full spline over exactly that window, so every pair is computed
    once with its exact factor (no cancellation between passes).  The
    band size is chosen at runtime from a static ladder via nested
    XLA-level lax.cond (only the taken branch executes): the smallest
    band whose width covers every r < h_eff pair, falling back to the
    single-pass spline kernel when the maximum softening is comparable
    to the slab structure (correct for any data).

    This is the TPU-native expression of the spline's compact support:
    per-tile conditionals cannot skip work on the VPU (measured: both
    pl.when and in-kernel lax.cond execute both vector branches), but
    splitting the *grid* can.  Measured single-chip: ~95 -> ~137 Gint/s
    at N = 64k (h = 0.05 Plummer), beating the reference's RTX 3080
    headline of 124 Gint/s (reference: fields.py:743-746).

    ``order`` may supply a precomputed (possibly stale) slab order: the
    integrator re-sorts once per scanned chunk instead of per force call
    (XLA's TPU sort costs ~4.8 s at N = 2M — comparable to the force
    kernel itself).  Any permutation is *exact* here: the band windows
    are recomputed from the actual positions every call, so rows outside
    the window are provably Newtonian (|dx| > max h) and a badly stale
    order only widens ``max_width`` until the single-pass fallback
    takes over — performance degrades, correctness never.
    """
    if mode == "pot":
        # the pot contraction computes the same products in the same
        # order folded or not (s@gm vs (gm*s)@1 — measured bitwise
        # identical on the v5e), so normalise to the default and save
        # a pointless ~30 s remote-compile kernel variant
        fold_mass = True
    if order is None:
        order = slab_sort_key(pos)
    ps = pos[order]
    gs = gmass[order]
    hsoft = soft[order]
    hinv = _soft_pre("spline", hsoft)
    mask_self = mode == "pot"
    if mxu is None:
        # the fast (expanded-r2) tier requires the MXU moment form even
        # in interpret mode (dot_general interprets fine; only the
        # Mosaic lowering motivated the interpret exclusion)
        mxu = (MXU_BASE and not interpret) or fast
    if fast and not mxu:
        raise ValueError(
            "float32_fast builds r^2 on the MXU moment path; "
            "tile mxu=False conflicts with fast=True")
    if (mxu and mode == "acc") or fast:
        # centre the coordinates: the MXU moment rewrite subtracts two
        # large sums (S@xs vs x_t*(S@1)), with cancellation error
        # ~ eps * |x| * sum(s).  Acceleration is translation invariant,
        # so shifting to the centroid bounds |x| by the system extent
        # (measured: off-centre at ~140 length units, 5e-5 max rel
        # error uncentred vs 7e-7 centred == the jnp-path floor).
        # The fast tier needs it in BOTH modes: its expanded
        # r^2 = |x_t|^2 + |x_s|^2 - 2 x_t.x_s cancellation scales with
        # |x|^2 regardless of what the factor feeds.
        ps = ps - jnp.mean(ps, axis=0, keepdims=True)

    nt = ps.shape[0]
    tm = TM if tm is None else tm
    tn = TN if tn is None else tn
    max_sub = MAX_SUB if max_sub is None else max_sub
    nt_pad = -(-nt // tm) * tm
    ns_pad = -(-nt // tn) * tn
    n_i = nt_pad // tm
    rows = ns_pad // tn

    x = ps[:, 0]
    x_t = jnp.pad(x, (0, nt_pad - nt), mode="edge").reshape(n_i, tm)
    x_s = jnp.pad(x, (0, ns_pad - nt), mode="edge").reshape(rows, tn)
    t_lo, t_hi = x_t.min(axis=1), x_t.max(axis=1)
    s_lo, s_hi = x_s.min(axis=1), x_s.max(axis=1)
    h_max = jnp.max(hsoft)
    # order-independent window: [first, last] index of rows NOT provably
    # far (a row is far iff its whole x-span is > h_max outside the
    # tile's).  Counting "entirely below" rows instead (the previous
    # form) is only equivalent when row spans are monotone — true for a
    # fresh sort, not for a stale one once a particle crosses slabs.
    # (Empirically the self-gravity case was still protected: a slab
    # crosser inflates its own TARGET tile's span, pushing max_width
    # over nb and forcing the fallback — but that is a coincidence of
    # targets == sources, not a provable invariant.)  With first/last
    # the window provably covers every near row whenever
    # max_width <= nb, for ANY permutation; otherwise the exact
    # single-pass fallback takes over.  O(n_i * rows) — negligible.
    far = jnp.logical_or(s_hi[None, :] < (t_lo - h_max)[:, None],
                         s_lo[None, :] > (t_hi + h_max)[:, None])
    ridx = jnp.arange(rows, dtype=jnp.int32)[None, :]
    first = jnp.min(jnp.where(far, rows, ridx), axis=1)
    last = jnp.max(jnp.where(far, -1, ridx), axis=1)
    j_lo = first
    max_width = jnp.max(last - first + 1)

    def fast_with(nb):
        start = jnp.clip(j_lo, 0, rows - nb)

        def fast_path(p):
            base = _pallas_direct(p, hsoft, p, gs, hsoft, "newtonian",
                                  kahan, mode, eps2, tm=tm, tn=tn,
                                  max_sub=max_sub, interpret=interpret,
                                  mask_self=mask_self,
                                  skip_band=nb, band_start=start,
                                  mxu=mxu, mxu_r2=fast,
                                  fold_mass=fold_mass)
            band = _pallas_band_correction(p, gs, hinv, start, mode,
                                           eps2, tm, tn, nb,
                                           interpret=interpret,
                                           mask_self=mask_self,
                                           kahan=kahan, mxu=mxu)
            return base + band

        return fast_path

    def slow(p):
        return _pallas_direct(p, hsoft, p, gs, hsoft, "spline", kahan,
                              mode, eps2, tm=tm, tn=tn, max_sub=max_sub,
                              interpret=interpret, mask_self=mask_self,
                              fold_mass=fold_mass)

    # one static band size (~6% of rows, floor 12): every extra Pallas
    # kernel variant costs a full remote compile on this platform, so a
    # multi-rung ladder traded ~4% runtime for minutes of first-run
    # compilation; a single rung + fallback keeps it to three kernels
    nb = min(max(12, rows // 16), rows)
    out_s = jax.lax.cond(max_width <= nb, fast_with(nb), slow, ps)
    return jnp.zeros_like(out_s).at[order].set(out_s)


# ---------------------------------------------------------------------------
# Public wrappers
# ---------------------------------------------------------------------------

def pallas_accel_2set(pos_t, soft_t, pos_s, gmass_s, soft_s, kind, kahan,
                      eps2=PAIRWISE_EPS2, interpret=False, mxu=False,
                      mask_self=False):
    """Accelerations of targets due to sources (G folded into gmass_s).

    ``mxu=True`` uses the MXU moment rewrite (see _tile_sum): the caller
    is responsible for centring the coordinate frame — both sets shifted
    by the SAME offset — to bound the moment-cancellation error (the
    sharded ring subtracts the global centroid once per evaluation), and
    must pass ``mask_self=True`` whenever targets and sources are the
    same block (the moment form cannot rely on s_ii * dx_ii == 0)."""
    return _pallas_direct(
        pos_t.astype(jnp.float32), soft_t.astype(jnp.float32),
        pos_s.astype(jnp.float32), gmass_s.astype(jnp.float32),
        soft_s.astype(jnp.float32), kind, kahan, "acc", float(eps2),
        interpret=interpret, mxu=mxu, mask_self=mask_self and mxu,
    )


def pallas_potential_2set(pos_t, soft_t, pos_s, gmass_s, soft_s, kind, kahan,
                          eps2=PAIRWISE_EPS2, interpret=False,
                          mask_self=False, mxu=False):
    """Potential of targets due to sources.

    ``mask_self=True`` excludes pairs at identical global row index — use
    it when targets and sources are the *same* array (single-chip path,
    or the self-block step of the sharded ring).  An outside closed-form
    subtraction would cancel catastrophically for h = 0 particles (the
    self term is -G m / sqrt(eps2) ~ 1e7 x the physical potential in
    fp32), so the exclusion happens in-kernel at zero cost off the
    diagonal tiles' hot path.

    ``mxu=True`` runs the row sum phi = S @ 1 on the MXU (no centring or
    finalisation needed — no coordinate products, so no cancellation;
    the self mask applies before the contraction).
    """
    return _pallas_direct(
        pos_t.astype(jnp.float32), soft_t.astype(jnp.float32),
        pos_s.astype(jnp.float32), gmass_s.astype(jnp.float32),
        soft_s.astype(jnp.float32), kind, kahan, "pot", float(eps2),
        interpret=interpret, mask_self=mask_self, mxu=mxu,
    )


def uses_spatial_sort(kind: str, n: int, spatial_sort=None) -> bool:
    """Whether pallas_accel/potential will take the slab-sorted path
    (the predicate the integrator uses to decide whether to thread a
    reusable sort order through the scan carry)."""
    if spatial_sort is None:
        return kind == "spline" and n >= 16384
    return bool(spatial_sort) and kind == "spline"


def slab_sort_key(pos):
    """The sort order the slab-sorted path uses (argsort along x)."""
    return jnp.argsort(pos[:, 0])


def _warn_tile_ignored(tile, kind, n):
    """The tm/tn/max_sub/mxu overrides only shape the slab-sorted
    two-pass path; warn rather than let a bencher believe they measured
    a geometry the non-sorted kernel never saw."""
    if tile:
        import warnings

        from ..species import PerformanceWarning

        warnings.warn(
            f"tile overrides {sorted(tile)} apply only to the "
            f"slab-sorted spline path (kernel='spline', N >= 16384); "
            f"ignored for kernel={kind!r}, N={n:,}",
            PerformanceWarning, stacklevel=3)


def pallas_accel(pos, mass, soft, G, kind, kahan, eps2=PAIRWISE_EPS2,
                 interpret=False, spatial_sort=None, order=None,
                 fast=False, tile=None):
    """(N, 3) float32 self-gravity accelerations (single chip).

    ``spatial_sort`` (default: auto for the spline kernel at N >= 16384)
    enables the slab-sort + compact-support two-pass fast path: every
    pair is still computed exactly once with its exact kernel factor,
    but the summation order differs from the single-pass kernel, so
    results agree to fp32 round-off (not bitwise).  ~40% fewer VPU ops
    on typical data.  ``order`` optionally supplies a precomputed slab
    order (see _pallas_self_sorted — exact even when stale).

    ``fast`` (the ``float32_fast`` precision tier) additionally builds
    r^2 on the MXU via the expanded |x_t|^2 + |x_s|^2 - 2 x_t.x_s form
    in the two-pass base kernel — roughly half the VPU work per pair at
    a documented accuracy cost (~1e-4 worst-case vs the ~1e-6 fp32
    floor; the near-pair band pass stays exact).  Only meaningful on
    the sorted path; ignored otherwise.

    ``tile`` optionally overrides the sorted path's tile geometry /
    moment-pass choice: a dict with any of ``tm``, ``tn``, ``max_sub``,
    ``mxu``, ``fold_mass`` (defaults: module constants TM/TN/MAX_SUB,
    MXU_BASE, True — ``fold_mass=False`` keeps the gm*f product on the
    VPU per pair, the tight-drift tier DirectGravity selects for
    ``target_drift`` below ~1e-7).  The
    delivered compute of a tunnelled chip allocation penalises Mosaic
    and MXU paths non-uniformly between sessions (docs/performance.md,
    device-allocation variance), so the optimal config is
    allocation-dependent — bench.py auto-tries a small set.
    """
    gmass = (mass * G).astype(jnp.float32)
    soft = soft.astype(jnp.float32)
    pos = pos.astype(jnp.float32)
    if uses_spatial_sort(kind, pos.shape[0], spatial_sort):
        return _pallas_self_sorted(pos, gmass, soft, kind, kahan, "acc",
                                   float(eps2), interpret, order=order,
                                   fast=fast, **(tile or {}))
    _warn_tile_ignored(tile, kind, pos.shape[0])
    return pallas_accel_2set(pos, soft, pos, gmass, soft, kind, kahan,
                             eps2, interpret)


def pallas_potential(pos, mass, soft, G, kind, kahan, eps2=PAIRWISE_EPS2,
                     interpret=False, spatial_sort=None, order=None,
                     fast=False, tile=None):
    """(N,) float32 self-gravity potential (self pair masked in-kernel).

    ``tile``: see :func:`pallas_accel`."""
    gmass = (mass * G).astype(jnp.float32)
    soft = soft.astype(jnp.float32)
    pos = pos.astype(jnp.float32)
    if uses_spatial_sort(kind, pos.shape[0], spatial_sort):
        return _pallas_self_sorted(pos, gmass, soft, kind, kahan, "pot",
                                   float(eps2), interpret, order=order,
                                   fast=fast, **(tile or {}))
    _warn_tile_ignored(tile, kind, pos.shape[0])
    return pallas_potential_2set(pos, soft, pos, gmass, soft, kind, kahan,
                                 eps2, interpret, mask_self=True)
