"""Unified soft-constraint solver: joint limits + frictional contacts.

MuJoCo-style constraint model (the role of libmujoco's mj_fwdConstraint):
each row has impedance d(pos) from solimp, reference acceleration
aref = -b*vel - k*pos from solref, and regularizer R = (1-d)/d * diag(A);
the dual problem  min 1/2 f'(A+R)f - f'(aref - J qacc_smooth)  is solved
with fixed-iteration projected Gauss-Seidel:

  * limit rows:    f >= 0
  * contact rows:  normal f_n >= 0, tangent |f_t| <= mu * f_n
                   (elliptic friction-cone projection; MuJoCo 2.0's default
                   is a pyramidal LP approximation — the cone projection is
                   the same physics with a cleaner fixed-point update, and
                   maps better to vectorized hardware)

Everything is static-shaped: the constraint row count is fixed per compiled
model; inactive rows are masked. The PGS sweep is a `fori_loop` whose body
is a static unroll over constraint blocks — small ops that batch over the
env axis under vmap.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from . import model as M
from .collision import Contact


def impedance(solimp: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """solimp impedance d(pos): dmin..dmax over `width` of violation."""
    dmin, dmax, width, mid, power = (solimp[0], solimp[1], solimp[2],
                                     solimp[3], solimp[4])
    x = jnp.clip(jnp.abs(pos) / jnp.maximum(width, 1e-10), 0.0, 1.0)
    lo = mid * (x / jnp.maximum(mid, 1e-10)) ** power
    hi = 1.0 - (1.0 - mid) * ((1.0 - x) / jnp.maximum(1.0 - mid, 1e-10)
                              ) ** power
    y = jnp.where(x < mid, lo, hi)
    d = dmin + y * (dmax - dmin)
    return jnp.clip(d, 1e-4, 0.9999)


def kbi(solref, solimp, pos, timestep):
    """Stiffness k, damping b, impedance d for one row (mj_makeImpedance).
    timeconst is clamped to >= 2*timestep for stability, as in MuJoCo."""
    d = impedance(solimp, pos)
    dmax = solimp[1]
    timeconst = jnp.maximum(solref[0], 2.0 * timestep)
    dampratio = solref[1]
    b = 2.0 / jnp.maximum(dmax * timeconst, 1e-10)
    k = d / jnp.maximum(dmax * dmax * timeconst * timeconst
                        * dampratio * dampratio, 1e-10)
    return k, b, d


class ConstraintSet:
    """Assembled rows: J (nr, nv), aref, R, plus block structure."""

    def __init__(self, J, aref, R, active, blocks, mu,
                 friction_bounds=()):
        self.J = J
        self.aref = aref
        self.R = R
        self.active = active
        self.blocks = blocks      # ('limit'|'friction'|'contact', row idx)
        self.mu = mu              # (n_contacts,) slide friction
        self.friction_bounds = friction_bounds  # per 'friction' block


def _limited_joints(m: M.Model) -> Tuple[int, ...]:
    if m.opt.disableflags & M.DSBL_LIMIT:
        return ()
    return tuple(j for j in range(m.njnt)
                 if m.jnt_limited[j] and m.jnt_type[j] in (M.SLIDE, M.HINGE))


def _point_jacobian_row(m: M.Model, meta, cdof, body: int,
                        point: jnp.ndarray, nv: int) -> jnp.ndarray:
    """Translational jacobian (3, nv) of `point` on `body`."""
    J = jnp.zeros((3, nv), cdof.dtype)
    for k in meta.ancestor_dofs[body]:
        v = cdof[k, 3:] + jnp.cross(cdof[k, :3], point)
        J = J.at[:, k].set(v)
    return J


def assemble(m: M.Model, meta, qpos, qvel, cdof,
             contact: Optional[Contact],
             site_xpos: Optional[jnp.ndarray] = None) -> \
        Optional[ConstraintSet]:
    """Build the full constraint row set for one configuration."""
    import numpy as np
    dtype = qpos.dtype
    nv = m.nv
    h = m.opt.timestep
    rows_J: List[jnp.ndarray] = []
    rows_aref: List[jnp.ndarray] = []
    rows_R: List[jnp.ndarray] = []
    rows_active: List[jnp.ndarray] = []
    blocks = []
    mus = []
    friction_bounds = []

    # ---- dof friction loss (finger spinner hinge) --------------------------
    fl_np = np.asarray(m.dof_frictionloss)
    for k in range(nv):
        if float(fl_np[k]) == 0.0:
            continue
        Jrow = jnp.zeros((nv,), dtype).at[k].set(1.0)
        kk, bb, dd = kbi(jnp.asarray([0.02, 1.0], dtype),
                         jnp.asarray([0.9, 0.95, 0.001, 0.5, 2.0], dtype),
                         jnp.zeros((), dtype), h)
        blocks.append(('friction', len(rows_J)))
        friction_bounds.append(m.dof_frictionloss[k])
        rows_J.append(Jrow)
        rows_aref.append(-bb * qvel[k])
        rows_R.append((1.0 - dd) / dd)
        rows_active.append(jnp.ones((), dtype))

    # ---- tendon equality constraints (manipulator hand coupling) -----------
    for (t, solref, solimp) in m.eq_tendon:
        from . import smooth as _smooth
        length = _smooth.fixed_tendon_length(m, qpos, t)
        Jrow = m.tendon_moment[t]
        kk, bb, dd = kbi(jnp.asarray(solref, dtype),
                         jnp.asarray(solimp, dtype), length, h)
        vel = Jrow @ qvel
        blocks.append(('equality', len(rows_J)))
        rows_J.append(Jrow)
        rows_aref.append(-bb * vel - kk * length)
        rows_R.append((1.0 - dd) / dd)
        rows_active.append(jnp.ones((), dtype))

    # ---- spatial tendon length limits (ball_in_cup string) -----------------
    for (s1, s2, limited, lo, hi) in m.spatial_tendons:
        if not limited or site_xpos is None:
            continue
        p1, p2 = site_xpos[s1], site_xpos[s2]
        diff = p1 - p2
        length = jnp.linalg.norm(diff)
        u = diff / jnp.maximum(length, 1e-9)
        b1 = m.site_body[s1]
        b2 = m.site_body[s2]
        # dL/dq = u.(J1 - J2); constraint J = -dL/dq so positive force
        # shortens the tendon
        Jrow = -(u @ _point_jacobian_row(m, meta, cdof, b1, p1, nv)
                 - u @ _point_jacobian_row(m, meta, cdof, b2, p2, nv))
        pos = hi - length           # negative when string over-stretched
        kk, bb, dd = kbi(jnp.asarray([0.02, 1.0], dtype),
                         jnp.asarray([0.9, 0.95, 0.001, 0.5, 2.0], dtype),
                         jnp.minimum(pos, 0.0), h)
        vel = Jrow @ qvel
        blocks.append(('limit', len(rows_J)))
        rows_J.append(Jrow)
        rows_aref.append(-bb * vel - kk * jnp.minimum(pos, 0.0))
        rows_R.append((1.0 - dd) / dd)
        rows_active.append((pos < 0.0).astype(dtype))

    # ---- joint limits -----------------------------------------------------
    for j in _limited_joints(m):
        qadr, dadr = m.jnt_qposadr[j], m.jnt_dofadr[j]
        lo, hi = m.jnt_range[j, 0], m.jnt_range[j, 1]
        dist_lo = qpos[qadr] - lo
        dist_hi = hi - qpos[qadr]
        use_lo = dist_lo < dist_hi
        sign = jnp.where(use_lo, 1.0, -1.0).astype(dtype)
        pos = jnp.where(use_lo, dist_lo, dist_hi) - m.jnt_margin[j]
        Jrow = jnp.zeros((nv,), dtype).at[dadr].set(sign)
        k, b, d = kbi(m.jnt_solref[j], m.jnt_solimp[j],
                      jnp.minimum(pos, 0.0), h)
        vel = sign * qvel[dadr]
        blocks.append(('limit', len(rows_J)))
        rows_J.append(Jrow)
        rows_aref.append(-b * vel - k * jnp.minimum(pos, 0.0))
        rows_R.append((1.0 - d) / d)    # scaled by diag(A) later
        rows_active.append((pos < 0.0).astype(dtype))

    # ---- contacts -----------------------------------------------------------
    if contact is not None and len(contact.geom1):
        for c in range(len(contact.geom1)):
            b1 = m.geom_body[contact.geom1[c]]
            b2 = m.geom_body[contact.geom2[c]]
            point = contact.pos[c]
            Jp = (_point_jacobian_row(m, meta, cdof, b2, point, nv)
                  - _point_jacobian_row(m, meta, cdof, b1, point, nv))
            frame = contact.frame[c]       # rows: n, t1, t2
            Jc = frame @ Jp                # (3, nv)
            pos = jnp.minimum(contact.dist[c], 0.0)
            k, b, d = kbi(contact.solref[c], contact.solimp[c], pos, h)
            vel = Jc @ qvel
            active = (contact.dist[c] < 0.0).astype(dtype)
            blocks.append(('contact', len(rows_J)))
            # condim 1 => frictionless contact (mjModel geom_condim max rule)
            cdim = max(m.geom_condim[contact.geom1[c]],
                       m.geom_condim[contact.geom2[c]])
            mus.append(contact.friction[c, 0] if cdim >= 3
                       else jnp.zeros((), dtype))
            # normal row
            rows_J.append(Jc[0])
            rows_aref.append(-b * vel[0] - k * pos)
            rows_R.append((1.0 - d) / d)
            rows_active.append(active)
            # tangent rows (position term zero)
            for t in (1, 2):
                rows_J.append(Jc[t])
                rows_aref.append(-b * vel[t])
                rows_R.append((1.0 - d) / d)
                rows_active.append(active)

    if not rows_J:
        return None

    J = jnp.stack(rows_J)
    aref = jnp.stack(rows_aref)
    Rscale = jnp.stack(rows_R)
    active = jnp.stack(rows_active)
    mu = (jnp.stack(mus) if mus else jnp.zeros((0,), dtype))
    return ConstraintSet(J, aref, Rscale, active, blocks, mu,
                         tuple(friction_bounds))


def solve(m: M.Model, cs: Optional[ConstraintSet], qM_chol,
          qacc_smooth: jnp.ndarray,
          iterations: Optional[int] = None) -> jnp.ndarray:
    """PGS solve -> (qfrc_constraint (nv,), row forces f (nr,) or None)."""
    if cs is None:
        return jnp.zeros_like(qacc_smooth), None
    iterations = iterations or m.opt.solver_iterations

    MinvJT = jax.scipy.linalg.cho_solve(qM_chol, cs.J.T)   # (nv, nr)
    A = cs.J @ MinvJT                                      # (nr, nr)
    diagA = jnp.maximum(jnp.diag(A), 1e-10)
    R = cs.R * diagA
    Ad = A + jnp.diag(R)
    diag = jnp.maximum(jnp.diag(Ad), 1e-10)
    rhs = (cs.aref - cs.J @ qacc_smooth) * cs.active

    n_rows = cs.J.shape[0]
    mu_of_block = {}
    fl_of_block = {}
    ci = fi_ = 0
    for kind, i0 in cs.blocks:
        if kind == 'contact':
            mu_of_block[i0] = cs.mu[ci]
            ci += 1
        elif kind == 'friction':
            fl_of_block[i0] = cs.friction_bounds[fi_]
            fi_ += 1

    def sweep(_, f):
        for kind, i0 in cs.blocks:
            if kind == 'limit':
                res = Ad[i0] @ f - rhs[i0]
                fi = jnp.maximum(0.0, f[i0] - res / diag[i0])
                f = f.at[i0].set(fi * cs.active[i0])
            elif kind == 'friction':
                res = Ad[i0] @ f - rhs[i0]
                bound = fl_of_block[i0]
                fi = jnp.clip(f[i0] - res / diag[i0], -bound, bound)
                f = f.at[i0].set(fi * cs.active[i0])
            elif kind == 'equality':
                res = Ad[i0] @ f - rhs[i0]
                f = f.at[i0].set(f[i0] - res / diag[i0])
            else:
                mu = mu_of_block[i0]
                # normal
                res = Ad[i0] @ f - rhs[i0]
                fn = jnp.maximum(0.0, f[i0] - res / diag[i0])
                f = f.at[i0].set(fn * cs.active[i0])
                # tangents, then project onto the friction cone
                res1 = Ad[i0 + 1] @ f - rhs[i0 + 1]
                ft1 = f[i0 + 1] - res1 / diag[i0 + 1]
                res2 = Ad[i0 + 2] @ f - rhs[i0 + 2]
                ft2 = f[i0 + 2] - res2 / diag[i0 + 2]
                tnorm = jnp.sqrt(ft1 * ft1 + ft2 * ft2)
                limit = mu * f[i0]
                scale = jnp.where(tnorm > limit,
                                  limit / jnp.maximum(tnorm, 1e-12), 1.0)
                f = f.at[i0 + 1].set(ft1 * scale * cs.active[i0 + 1])
                f = f.at[i0 + 2].set(ft2 * scale * cs.active[i0 + 2])
        return f

    f0 = jnp.zeros((n_rows,), qacc_smooth.dtype)
    f = jax.lax.fori_loop(0, iterations, sweep, f0)
    return cs.J.T @ f, f


def contact_forces(cs: Optional[ConstraintSet], f: Optional[jnp.ndarray],
                   n_contacts: int, dtype) -> jnp.ndarray:
    """Extract per-contact (normal, t1, t2) forces from the row solution."""
    out = jnp.zeros((n_contacts, 3), dtype)
    if cs is None or f is None:
        return out
    ci = 0
    for kind, i0 in cs.blocks:
        if kind == 'contact':
            out = out.at[ci].set(f[i0:i0 + 3])
            ci += 1
    return out
