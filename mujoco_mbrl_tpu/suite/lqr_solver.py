"""Analytic LQR solution for the lqr domain (correctness oracle).

Mirrors the reference solver (``dm_control/dm_control/suite/lqr_solver.py``):
discretize the linear spring-mass dynamics, solve the discrete algebraic
Riccati equation, return (P, K, beta). Used by tests as exact ground truth
for the physics + control stack (SURVEY §4.2).
"""

from __future__ import annotations

import numpy as np

try:
    import scipy.linalg as _sp
except ImportError:          # pragma: no cover
    _sp = None


def solve_dare_iter(a, b, q, r, iters: int = 1_000_000, tol: float = 1e-12):
    """DARE by fixed-point iteration (used when scipy is unavailable)."""
    p = np.eye(len(a))
    for _ in range(iters):
        a_p = a.T @ p
        a_p_b = a_p @ b
        p_next = q + a_p @ a - a_p_b @ np.linalg.solve(
            b.T @ p @ b + r, a_p_b.T)
        p_next = 0.5 * (p_next + p_next.T)
        if np.abs(p - p_next).max() < tol:
            p = p_next
            break
        p = p_next
    np.linalg.cholesky(p)   # raises if not PD
    return p


def solve(env):
    """Optimal (P, K, beta) for an lqr-domain environment.

    The discretization follows the reference's semi-implicit model
    (lqr_solver.py:100-121): with J = -M^-1 [S D],
      A = I + dt * [[dt*J + [0 I]], [J]],  B = dt * [[dt*Bc], [Bc]].
    """
    import jax.numpy as jnp

    from ..physics import engine, make_state

    m = env.model
    n, nu = m.nq, m.nu

    data = engine.forward(m, make_state(m), jnp.zeros(m.nu))
    mass = np.asarray(data.qM)

    stiffness = np.diag(np.asarray(m.jnt_stiffness))
    damping = np.diag(np.asarray(m.dof_damping))
    dt = float(np.asarray(m.opt.timestep))

    j = np.linalg.solve(-mass, np.hstack((stiffness, damping)))
    a = np.eye(2 * n) + dt * np.vstack(
        (dt * j + np.hstack((np.zeros((n, n)), np.eye(n))), j))

    # actuator moment: joint transmission with gear
    bmat = np.zeros((n, nu))
    for u in range(nu):
        jid = m.actuator_trnid[u]
        bmat[m.jnt_dofadr[jid], u] = float(np.asarray(m.actuator_gear)[u])
    bc = np.linalg.solve(mass, bmat)
    b = dt * np.vstack((dt * bc, bc))

    q = np.diag(np.hstack([np.ones(n), np.zeros(n)]))
    r = env.task.control_cost_coef * np.eye(nu)

    if _sp is not None:
        p = _sp.solve_discrete_are(a, b, q, r)
    else:
        p = solve_dare_iter(a, b, q, r)
    k = -np.linalg.solve(b.T @ p @ b + r, b.T @ p @ a)
    beta = np.abs(np.linalg.eigvals(a + b @ k)).max()
    if beta >= 1.0:
        raise RuntimeError('Controlled system is unstable.')
    return p, k, beta
