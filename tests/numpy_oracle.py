"""Independent pure-NumPy oracle for pairwise softened gravity.

Deliberately written as a straightforward double-precision O(N^2) loop-free
NumPy implementation, structurally different from the framework's blocked
jax path, following the reference test strategy of validating against an
independent reimplementation (reference: tests/test_physics.py:84-124).
"""
import numpy as np

EPS2 = 1e-15


def _kernel_w(kind, r2, h):
    """Force factor w with a_i = G sum_j m_j w (x_j - x_i)."""
    r = np.sqrt(r2)
    with np.errstate(divide="ignore", invalid="ignore"):
        if kind == "newtonian":
            return r2 ** -1.5
        if kind == "plummer":
            return (r2 + h * h) ** -1.5
        if kind == "dehnen_k1":
            d = r2 + h * h
            return d ** -1.5 + 1.5 * h**2 * d ** -2.5
        if kind == "dehnen_k2":
            d = r2 + h * h
            return d ** -1.5 + 1.5 * h**2 * d ** -2.5 + 3.75 * h**4 * d ** -3.5
        if kind == "spline":
            w = np.where(r > 0, r, 1.0) ** -3.0
            inside = (r < h) & (h > 0)
            q = np.where(h > 0, r / np.where(h > 0, h, 1.0), 2.0)
            h3 = np.where(h > 0, h, 1.0) ** -3.0
            w_in = h3 * (10.666666666666666 + q**2 * (32.0 * q - 38.4))
            q_safe = np.where(q > 0, q, 1.0)
            w_out = h3 * (
                21.333333333333333
                - 48.0 * q
                + 38.4 * q**2
                - 10.666666666666667 * q**3
                - 0.0666666666666667 / q_safe**3
            )
            w_soft = np.where(q <= 0.5, w_in, w_out)
            w_soft = np.where(q < 1e-8, h3 * 10.666666666666666, w_soft)
            return np.where(inside, w_soft, w)
    raise ValueError(kind)


def _kernel_u(kind, r2, h):
    """Potential factor u with phi_i = G sum_j m_j u."""
    r = np.sqrt(r2)
    with np.errstate(divide="ignore", invalid="ignore"):
        if kind == "newtonian":
            return np.where(r > 0, -1.0 / np.where(r > 0, r, 1.0), 0.0)
        if kind == "plummer":
            return -((r2 + h * h) ** -0.5)
        if kind == "dehnen_k1":
            d = r2 + h * h
            return -(d ** -0.5) - 0.5 * h**2 * d ** -1.5
        if kind == "dehnen_k2":
            d = r2 + h * h
            return (
                -(d ** -0.5) - 0.5 * h**2 * d ** -1.5
                - 0.375 * h**4 * d ** -2.5
            )
        if kind == "spline":
            u_newt = np.where(r > 0, -1.0 / np.where(r > 0, r, 1.0), 0.0)
            inside = (r < h) & (h > 0)
            hs = np.where(h > 0, h, 1.0)
            q = np.where(h > 0, r / hs, 2.0)
            q_safe = np.where(q > 0, q, 1.0)
            # q**2 nesting (the reference's CUDA kernel has q**4 here,
            # a bug: discontinuous at q=0.5, not the force's integral)
            u_in = (-2.8 + q**2 * (16.0 / 3.0 + q**2 * (6.4 * q - 9.6))) / hs
            u_out = (
                -3.2
                + 1.0 / (15.0 * q_safe)
                + q**2 * (32.0 / 3.0 - 16.0 * q + 9.6 * q**2
                          - 32.0 / 15.0 * q**3)
            ) / hs
            u_soft = np.where(q <= 0.5, u_in, u_out)
            u_soft = np.where(q < 1e-8, -2.8 / hs, u_soft)
            return np.where(inside, u_soft, u_newt)
    raise ValueError(kind)


def oracle_forces(pos, mass, soft, G, kind="spline"):
    pos = np.asarray(pos, np.float64)
    n = pos.shape[0]
    mass = np.broadcast_to(np.asarray(mass, np.float64), (n,))
    soft = np.broadcast_to(np.asarray(soft, np.float64), (n,))
    dx = pos[None, :, :] - pos[:, None, :]          # (i, j, 3): x_j - x_i
    r2 = (dx**2).sum(-1) + EPS2
    h = np.maximum(soft[:, None], soft[None, :])
    w = _kernel_w(kind, r2, h)
    np.fill_diagonal(w, 0.0)
    s = mass[None, :] * w
    return G * (s[:, :, None] * dx).sum(axis=1)


def oracle_potential(pos, mass, soft, G, kind="spline"):
    pos = np.asarray(pos, np.float64)
    n = pos.shape[0]
    mass = np.broadcast_to(np.asarray(mass, np.float64), (n,))
    soft = np.broadcast_to(np.asarray(soft, np.float64), (n,))
    dx = pos[None, :, :] - pos[:, None, :]
    r2 = (dx**2).sum(-1) + EPS2
    h = np.maximum(soft[:, None], soft[None, :])
    u = _kernel_u(kind, r2, h)
    np.fill_diagonal(u, 0.0)
    return G * (mass[None, :] * u).sum(axis=1)


def total_energy(xv, mass, soft, G, kind="spline"):
    """KE + PE with PE = 0.5 * sum m_i phi_i."""
    mass = np.broadcast_to(np.asarray(mass, np.float64), (xv.shape[0],))
    ke = 0.5 * np.sum(mass * (xv[:, 3:] ** 2).sum(axis=1))
    phi = oracle_potential(xv[:, :3], mass, soft, G, kind)
    pe = 0.5 * np.sum(mass * phi)
    return ke + pe
