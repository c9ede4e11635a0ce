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

__all__ = ["integrate_orbit", "integrate_orbits_released"]


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

    def body(carry, i):
        xv, t = carry
        t_next = t0 + (i + 1) * dt
        stepped = _rk4_step(acc, xv, t, dt)
        live = (t_release <= t + 0.5 * jnp.abs(dt))[:, None]
        xv = jnp.where(live, stepped, xv_release)
        out = xv if save_every else None
        return (xv, t_next), out

    idx = jnp.arange(n_steps, dtype=dtype)
    (xv, _), traj = lax.scan(
        body, (xv_release, jnp.asarray(t0, dtype)), idx)
    times = t0 + dt * np.arange(n_steps + 1)
    if save_every:
        traj = jnp.concatenate([xv_release[None], traj], axis=0)
        sel = np.arange(0, n_steps + 1, save_every)
        if sel[-1] != n_steps:
            sel = np.append(sel, n_steps)
        return times[sel], traj[sel]
    return times, xv
