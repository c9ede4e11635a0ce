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
        q4 = q2 * q2
        # no q ~ 0 special case: the inner polynomial tends to the exact
        # centre value -2.8 * hinv as q -> 0
        inner = (-2.8 + q2 * (5.333333333333333
                              + q4 * (6.4 * q - 9.6))) * hinv
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

# Default tile geometry (tuned on TPU v5e; see bench.py / tile sweep:
# 512/512/16 beat 256/512/16 by ~8%, 1024-row tiles fail to compile)
TM = 512        # targets per grid step
TN = 512        # source sub-tile width (lanes)
MAX_SUB = 16    # sub-tiles per source superblock


def _direct_kernel(xt_ref, yt_ref, zt_ref, ht_ref,
                   xs_ref, ys_ref, zs_ref, ms_ref, hs_ref,
                   out_ref, comp_ref,
                   *, kind, kahan, eps2, tm, tn, n_sub, mode, mask_self):
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
    if mask_self:
        from jax import lax as _lax

        iglob = i * tm + _lax.broadcasted_iota(jnp.int32, (tm, 1), 0)

    width = 3 if mode == "acc" else 1
    partial = jnp.zeros((tm, width), jnp.float32)
    for k in range(n_sub):
        xs = xs_ref[k:k + 1, :]     # (1, TN)
        ys = ys_ref[k:k + 1, :]
        zs = zs_ref[k:k + 1, :]
        gms = ms_ref[k:k + 1, :]
        hs = hs_ref[k:k + 1, :]
        dx = xs - xt
        dy = ys - yt
        dz = zs - zt
        # fma-chained with eps2 folded into the innermost term
        r2 = dx * dx + (dy * dy + (dz * dz + eps2))
        # pair softening combine: h2_eff = max (h^2 inputs) for
        # plummer/dehnen; hinv_eff = min (1/h inputs) for spline
        if kind == "spline":
            pre = jnp.minimum(ht, hs)
        else:
            pre = jnp.maximum(ht, hs)
        if mode == "acc":
            s = gms * _force_pre(kind, r2, pre)
            ax = jnp.sum(s * dx, axis=1, keepdims=True)
            ay = jnp.sum(s * dy, axis=1, keepdims=True)
            az = jnp.sum(s * dz, axis=1, keepdims=True)
            partial = partial + jnp.concatenate([ax, ay, az], axis=1)
        else:
            s = gms * _pot_pre(kind, r2, pre)
            if mask_self:
                from jax import lax as _lax

                jglob = (jb * (n_sub * tn) + k * tn
                         + _lax.broadcasted_iota(jnp.int32, (1, tn), 1))
                s = jnp.where(iglob == jglob, 0.0, s)
            partial = partial + jnp.sum(s, axis=1, keepdims=True)

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
        return jnp.where(h > 0, 1.0 / jnp.maximum(h, 1e-300), jnp.inf)
    return h * h


@functools.partial(
    jax.jit,
    static_argnames=("kind", "kahan", "mode", "eps2", "tm", "tn", "max_sub",
                     "interpret", "mask_self"),
)
def _pallas_direct(pos_t, soft_t, pos_s, gmass_s, soft_s,
                   kind, kahan, mode, eps2,
                   tm=TM, tn=TN, max_sub=MAX_SUB, interpret=False,
                   mask_self=False):
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

    width = 3 if mode == "acc" else 1
    kernel = functools.partial(
        _direct_kernel, kind=kind, kahan=kahan, eps2=eps2, tm=tm, tn=tn,
        n_sub=n_sub, mode=mode, mask_self=mask_self,
    )
    t_spec = pl.BlockSpec((tm, 1), lambda i, jb: (i, 0),
                          memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((n_sub, tn), lambda i, jb: (jb, 0),
                          memory_space=pltpu.VMEM)
    # Trace the kernel with x64 disabled: every value here is explicitly
    # f32/i32, but global x64 mode leaks an i64 grid temporary into the
    # Mosaic lowering ('failed to legalize func.return (i32, i64)').
    with jax.enable_x64(False):
        out = _call_kernel(kernel, n_i, n_jb, t_spec, s_spec, tm, width,
                           nt_pad, ns_pad, n_sub, tn, interpret,
                           xt, yt, zt, ht, xs, ys, zs, ms, hs)
    out = out[:nt]
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


# ---------------------------------------------------------------------------
# Public wrappers
# ---------------------------------------------------------------------------

def pallas_accel_2set(pos_t, soft_t, pos_s, gmass_s, soft_s, kind, kahan,
                      eps2=PAIRWISE_EPS2, interpret=False):
    """Accelerations of targets due to sources (G folded into gmass_s)."""
    return _pallas_direct(
        pos_t.astype(jnp.float32), soft_t.astype(jnp.float32),
        pos_s.astype(jnp.float32), gmass_s.astype(jnp.float32),
        soft_s.astype(jnp.float32), kind, kahan, "acc", float(eps2),
        interpret=interpret,
    )


def pallas_potential_2set(pos_t, soft_t, pos_s, gmass_s, soft_s, kind, kahan,
                          eps2=PAIRWISE_EPS2, interpret=False,
                          mask_self=False):
    """Potential of targets due to sources.

    ``mask_self=True`` excludes pairs at identical global row index — use
    it when targets and sources are the *same* array (single-chip path,
    or the self-block step of the sharded ring).  An outside closed-form
    subtraction would cancel catastrophically for h = 0 particles (the
    self term is -G m / sqrt(eps2) ~ 1e7 x the physical potential in
    fp32), so the exclusion happens in-kernel at zero cost off the
    diagonal tiles' hot path.
    """
    return _pallas_direct(
        pos_t.astype(jnp.float32), soft_t.astype(jnp.float32),
        pos_s.astype(jnp.float32), gmass_s.astype(jnp.float32),
        soft_s.astype(jnp.float32), kind, kahan, "pot", float(eps2),
        interpret=interpret, mask_self=mask_self,
    )


def pallas_accel(pos, mass, soft, G, kind, kahan, eps2=PAIRWISE_EPS2,
                 interpret=False):
    """(N, 3) float32 self-gravity accelerations (single chip)."""
    gmass = (mass * G).astype(jnp.float32)
    soft = soft.astype(jnp.float32)
    return pallas_accel_2set(pos, soft, pos, gmass, soft, kind, kahan,
                             eps2, interpret)


def pallas_potential(pos, mass, soft, G, kind, kahan, eps2=PAIRWISE_EPS2,
                     interpret=False):
    """(N,) float32 self-gravity potential (self pair masked in-kernel)."""
    gmass = (mass * G).astype(jnp.float32)
    soft = soft.astype(jnp.float32)
    return pallas_potential_2set(pos, soft, pos, gmass, soft, kind, kahan,
                                 eps2, interpret, mask_self=True)
