"""Inverse kinematics: damped least-squares site-pose solver.

Equivalent of the reference's ``dm_control/dm_control/utils/
inverse_kinematics.py`` (damped least squares on mj_jac output), as a pure
jittable function over the compiled model.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from . import engine, model as M, smooth
from .solver import _point_jacobian_row


def site_jacobian(m: M.Model, qpos: jnp.ndarray, site_id: int):
    """(3, nv) translational jacobian of a site + its world position."""
    meta = smooth.tree_meta(m)
    (xpos, xquat, xmat, geom_xpos, geom_xmat, site_xpos, xanchor,
     xaxis) = smooth.kinematics(m, qpos, meta)
    cdof = smooth.motion_subspace(m, xquat, xanchor, xaxis, meta)
    body = m.site_body[site_id]
    J = _point_jacobian_row(m, meta, cdof, body, site_xpos[site_id], m.nv)
    return J, site_xpos[site_id]


def qpos_from_site_pose(m: M.Model, site_name: str,
                        target_pos: jnp.ndarray,
                        qpos0: Optional[jnp.ndarray] = None,
                        max_steps: int = 50,
                        damping: float = 0.03,
                        max_update_norm: float = 2.0,
                        progress_thresh: float = 20.0):
    """Iteratively solve for qpos placing `site_name` at `target_pos`.

    Returns (qpos, err_norm). Fixed iteration count (jit-friendly); the
    reference's early-exit heuristics become no-op updates once converged.
    """
    site_id = m.name2id('site', site_name)
    qpos = jnp.asarray(qpos0 if qpos0 is not None else m.qpos0)

    def step(qpos, _):
        J, pos = site_jacobian(m, qpos, site_id)
        err = target_pos - pos
        # damped least squares: dq = J^T (J J^T + damping^2 I)^-1 err
        A = J @ J.T + (damping ** 2) * jnp.eye(3, dtype=qpos.dtype)
        dq = J.T @ jnp.linalg.solve(A, err)
        norm = jnp.linalg.norm(dq)
        scale = jnp.minimum(1.0, max_update_norm / jnp.maximum(norm, 1e-10))
        qpos = engine.integrate_pos(m, qpos, dq * scale, 1.0)
        return qpos, jnp.linalg.norm(err)

    qpos, errs = jax.lax.scan(step, qpos, None, length=max_steps)
    return qpos, errs[-1]
