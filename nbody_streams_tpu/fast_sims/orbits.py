"""Jittable orbit integration in external potentials.

Replaces the reference's use of ``agama.orbit`` (C++ DOP853) for orbit
rewinding and test-particle propagation (reference: fast_sims/spray.py:478,
609).  Fixed-step RK4 under ``lax.scan`` — fully on device, vectorised
over orbits, supports backward integration (t1 < t0), per-particle
release times (particles frozen until released — the particle-spray
pattern), and an optional extra acceleration term (dynamical friction on
the progenitor orbit).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["integrate_orbit", "integrate_orbit_adaptive",
           "integrate_orbits_released"]


def _accel_fn(pot, extra_accel=None):
    def acc(xv, t):
        pos = xv[..., :3]
        a = pot.force(pos, t=t)
        if extra_accel is not None:
            a = a + extra_accel(xv, t)
        return a

    return acc


def _rk4_step(acc, xv, t, dt):
    def deriv(state, tt):
        return jnp.concatenate(
            [state[..., 3:], acc(state, tt)], axis=-1)

    k1 = deriv(xv, t)
    k2 = deriv(xv + 0.5 * dt * k1, t + 0.5 * dt)
    k3 = deriv(xv + 0.5 * dt * k2, t + 0.5 * dt)
    k4 = deriv(xv + dt * k3, t + dt)
    return xv + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


def integrate_orbit(pot, xv0, t0: float, t1: float, n_steps: int = 2048,
                    extra_accel=None, dtype=None):
    """Integrate orbit(s) from t0 to t1 (either direction).

    xv0: (6,) or (N, 6).  Returns (times (n_steps+1,),
    trajectory (n_steps+1, ..., 6)) — every step stored, so the caller
    can spline/subsample (the agama.orbit `trajsize` analogue).
    """
    dtype = dtype or (jnp.float64 if jax.config.jax_enable_x64
                      else jnp.float32)
    xv0 = jnp.asarray(xv0, dtype)
    dt = (t1 - t0) / n_steps
    acc = _accel_fn(pot, extra_accel)

    def body(carry, i):
        xv, t = carry
        xv = _rk4_step(acc, xv, t, dt)
        t = t0 + (i + 1) * dt
        return (xv, t), xv

    (_, _), traj = lax.scan(
        body, (xv0, jnp.asarray(t0, dtype)),
        jnp.arange(n_steps, dtype=dtype))
    times = t0 + dt * np.arange(n_steps + 1)
    traj = jnp.concatenate([xv0[None], traj], axis=0)
    return times, traj


def integrate_orbits_released(pot, xv_release, t_release, t0: float,
                              t1: float, n_steps: int,
                              extra_accel=None, save_every: int = 0,
                              dtype=None):
    """Propagate an ensemble with per-particle release times.

    Each particle i holds its release state ``xv_release[i]`` until the
    integration time passes ``t_release[i]``, then evolves in ``pot``.
    This is the particle-spray propagation pattern (the reference hands
    agama.orbit an object-dtype array of per-particle segments,
    spray.py:609-641); here it is one masked scan.

    Returns (times, final (N,6)) when save_every == 0, else
    (save_times, trajectory (n_saves, N, 6)).
    """
    dtype = dtype or (jnp.float64 if jax.config.jax_enable_x64
                      else jnp.float32)
    xv_release = jnp.asarray(xv_release, dtype)
    t_release = jnp.asarray(t_release, dtype)
    dt = (t1 - t0) / n_steps
    acc = _accel_fn(pot, extra_accel)

    # release comparison must follow the integration DIRECTION: in a
    # backward run (t1 < t0, dt < 0) a particle is live once the clock
    # has passed BELOW its release time
    sgn = 1.0 if dt >= 0 else -1.0

    def body(carry, i):
        xv, t = carry
        t_next = t0 + (i + 1) * dt
        stepped = _rk4_step(acc, xv, t, dt)
        live = (sgn * t_release <= sgn * t + 0.5 * jnp.abs(dt))[:, None]
        xv = jnp.where(live, stepped, xv_release)
        return (xv, t_next), None

    times = t0 + dt * np.arange(n_steps + 1)
    if save_every:
        # decimate INSIDE the scan: stacking all n_steps states before
        # subsampling would materialise (n_steps, N, 6) on device —
        # ~20 GB for a 4096-step, 200k-particle spray (r3 review)
        k = int(save_every)
        n_full = n_steps // k
        rem = n_steps - n_full * k

        def block(carry, b):
            carry, _ = lax.scan(
                body, carry, b * k + jnp.arange(k, dtype=dtype))
            return carry, carry[0]

        carry = (xv_release, jnp.asarray(t0, dtype))
        carry, traj = lax.scan(block, carry,
                               jnp.arange(n_full, dtype=dtype))
        sel = np.arange(0, n_full * k + 1, k)
        if rem:
            carry, _ = lax.scan(
                body, carry,
                n_full * k + jnp.arange(rem, dtype=dtype))
            traj = jnp.concatenate([traj, carry[0][None]], axis=0)
            sel = np.append(sel, n_steps)
        traj = jnp.concatenate([xv_release[None], traj], axis=0)
        return times[sel], traj

    (xv, _), _ = lax.scan(
        body, (xv_release, jnp.asarray(t0, dtype)),
        jnp.arange(n_steps, dtype=dtype))
    return times, xv


# ---------------------------------------------------------------------------
# Error-controlled integration: embedded Dormand-Prince 5(4)
# ---------------------------------------------------------------------------
# Butcher tableau (Dormand & Prince 1980; the DOP853 family's little
# sibling — the reference leans on agama.orbit's DOP853 for rewinding,
# spray.py:478).  Fixed OUTPUT grid + adaptive substepping inside each
# output interval keeps everything scan-able: the outer loop is a
# lax.scan over output nodes, the inner loop a lax.while_loop with a
# PI-controlled step size shared across the batch.
_DP_C = np.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
_DP_A = np.zeros((7, 7))
_DP_A[1, 0] = 1 / 5
_DP_A[2, :2] = (3 / 40, 9 / 40)
_DP_A[3, :3] = (44 / 45, -56 / 15, 32 / 9)
_DP_A[4, :4] = (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729)
_DP_A[5, :5] = (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176,
                -5103 / 18656)
_DP_A[6, :6] = (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784,
                11 / 84)
_DP_B5 = _DP_A[6, :7].copy()                       # 5th-order weights
_DP_B4 = np.array([5179 / 57600, 0.0, 7571 / 16695, 393 / 640,
                   -92097 / 339200, 187 / 2100, 1 / 40])


def _dp45_step(deriv, xv, t, h, k1=None):
    """One embedded DP5(4) step: returns (xv5, err_estimate, k7).

    ``k1`` optionally supplies deriv(xv, t) (FSAL: row A[6] equals the
    5th-order weights, so the previous accepted step's k7 IS this
    step's k1 — reusing it saves one of the 7 derivative evaluations).
    """
    ks = [deriv(xv, t) if k1 is None else k1]
    for i in range(1, 7):
        acc = xv
        for j in range(i):
            acc = acc + (h * _DP_A[i, j]) * ks[j]
        ks.append(deriv(acc, t + _DP_C[i] * h))
    xv5 = xv
    err = jnp.zeros_like(xv)
    for i in range(7):
        xv5 = xv5 + (h * _DP_B5[i]) * ks[i]
        err = err + (h * (_DP_B5[i] - _DP_B4[i])) * ks[i]
    return xv5, err, ks[6]


def integrate_orbit_adaptive(pot, xv0, t0: float, t1: float,
                             n_out: int = 256, rtol: float = 1e-9,
                             atol: float = 1e-12, extra_accel=None,
                             max_substeps: int = 100_000,
                             dtype=None):
    """Error-controlled orbit integration on a fixed output grid.

    Adaptive Dormand-Prince 5(4) with a PI step controller replaces the
    fixed-step RK4 where accuracy matters (central cusps, highly
    eccentric orbits — the documented RK4 post-pericentre blow-up mode).
    The step size is shared across the batch (max error norm), so the
    output has the same (n_out+1, ..., 6) shape contract as
    ``integrate_orbit``.  Forward or backward (t1 < t0).

    ``max_substeps`` bounds the inner while_loop per output interval; if
    a interval exhausts it before reaching its end time, that interval's
    output (and the rest of the trajectory) is NaN-poisoned so the
    failure is visible rather than a silently-truncated integration.
    """
    dtype = dtype or (jnp.float64 if jax.config.jax_enable_x64
                      else jnp.float32)
    xv0 = jnp.asarray(xv0, dtype)
    acc = _accel_fn(pot, extra_accel)

    def deriv(state, tt):
        return jnp.concatenate([state[..., 3:], acc(state, tt)], axis=-1)

    h_out = (t1 - t0) / n_out
    sign = 1.0 if t1 >= t0 else -1.0

    def err_norm(err, xv_a, xv_b):
        # RMS over the 6 phase-space components of each orbit, then MAX
        # over the batch: the shared step must satisfy the WORST orbit.
        # A batch-wide mean would dilute one plunging orbit's error by
        # sqrt(batch) and silently accept steps that violate its rtol.
        scale = atol + rtol * jnp.maximum(jnp.abs(xv_a), jnp.abs(xv_b))
        per_orbit = jnp.sqrt(jnp.mean((err / scale) ** 2, axis=-1))
        return jnp.max(per_orbit)

    def advance_interval(carry, i):
        xv, h = carry
        t_start = t0 + i * h_out
        t_end = t0 + (i + 1) * h_out

        def cond(c):
            _xv, t, _h, n, _k1 = c
            return ((t - t_end) * sign < 0) & (n < max_substeps)

        def body(c):
            xv_c, t, h_c, n, k1 = c
            # clip the trial step to the interval end
            clip = (t + h_c - t_end) * sign > 0
            h_try = jnp.where(clip, t_end - t, h_c)
            xv_new, err, k7 = _dp45_step(deriv, xv_c, t, h_try, k1=k1)
            e = err_norm(err, xv_c, xv_new)
            # a NaN error estimate (singular force eval) must count as
            # "infinitely wrong": reject and shrink, never grow
            e = jnp.where(jnp.isfinite(e), e, jnp.inf)
            accept = e <= 1.0
            # PI controller, safety 0.9, order 5
            fac = jnp.clip(0.9 * e ** -0.2, 0.2, 5.0)
            h_next = jnp.where(jnp.abs(h_try * fac) < jnp.abs(h_c * 5.0),
                               h_try * fac, h_c * 5.0)
            # an accepted step that was clipped to the interval boundary
            # must not collapse the carried cruise step to the sliver
            h_next = jnp.where(clip & accept, h_c, h_next)
            xv_c = jnp.where(accept, xv_new, xv_c)
            t = jnp.where(accept, t + h_try, t)
            # FSAL: on accept, k7 = deriv(xv_new, t+h) is the next k1;
            # on reject (xv, t) are unchanged so k1 stays valid
            k1 = jnp.where(accept, k7, k1)
            return xv_c, t, h_next, n + 1, k1

        # an already-NaN carry (a previous interval failed) would burn
        # max_substeps rejected evaluations per remaining interval —
        # start with the budget spent so the loop never runs
        n0 = jnp.where(jnp.isfinite(xv).all(), 0, max_substeps)
        k1_0 = deriv(xv, jnp.asarray(t_start, dtype))
        xv, t_fin, h, n_fin, _ = lax.while_loop(
            cond, body, (xv, jnp.asarray(t_start, dtype), h, n0, k1_0))
        # if the substep budget ran out before t_end, poison the output
        # instead of returning a silently-truncated trajectory.  (The
        # budget check is primary: re-deriving the loop's own time
        # comparison here can disagree with `cond` by 1 ulp under XLA
        # expression contraction.)
        reached = (n_fin < max_substeps) | ((t_fin - t_end) * sign >= 0)
        xv = jnp.where(reached, xv, jnp.full_like(xv, jnp.nan))
        return (xv, h), xv

    h0 = jnp.asarray(h_out / 16.0, dtype)
    (_, _), traj = lax.scan(advance_interval, (xv0, h0),
                            jnp.arange(n_out, dtype=dtype))
    times = t0 + h_out * np.arange(n_out + 1)
    traj = jnp.concatenate([xv0[None], traj], axis=0)
    return times, traj
