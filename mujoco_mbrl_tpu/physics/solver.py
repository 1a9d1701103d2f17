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

import functools
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

    Standard form solref = (timeconst, dampratio) with timeconst clamped
    to >= 2*timestep for stability; non-positive solref uses MuJoCo's
    direct convention solref = (-stiffness, -damping) (quadruped ball:
    solref='-10000 -30')."""
    d = impedance(solimp, pos)
    dmax = solimp[1]
    timeconst = jnp.maximum(solref[0], 2.0 * timestep)
    dampratio = solref[1]
    b_std = 2.0 / jnp.maximum(dmax * timeconst, 1e-10)
    k_std = d / jnp.maximum(dmax * dmax * timeconst * timeconst
                            * dampratio * dampratio, 1e-10)
    b_dir = -solref[1] / jnp.maximum(dmax, 1e-10)
    k_dir = -solref[0] * d / jnp.maximum(dmax * dmax, 1e-10)
    direct = jnp.logical_or(solref[0] <= 0, solref[1] <= 0)
    return (jnp.where(direct, k_dir, k_std),
            jnp.where(direct, b_dir, b_std), d)


class ConstraintSet:
    """Assembled rows: J (nr, nv), aref, R, plus block structure.

    R here is MuJoCo's ABSOLUTE regularizer (1-d)/d * diagApprox built
    from the *_invweight0 constants — not a scale applied to diag(A).
    `blocks` kinds: 'limit' (f>=0), 'friction' (|f|<=bound), 'equality'
    (unbounded), 'facet' (pyramidal facet, f>=0), 'contact' (elliptic
    3-row cone block). `pyramids` records (first_row, n_dirs) per
    pyramidal contact for force reconstruction."""

    def __init__(self, J, aref, R, active, blocks, mu,
                 friction_bounds=(), pyramids=()):
        self.J = J
        self.aref = aref
        self.R = R
        self.active = active
        self.blocks = blocks      # (kind, row idx)
        self.mu = mu              # (n_contacts,) slide friction
        self.friction_bounds = friction_bounds  # per 'friction' block
        self.pyramids = pyramids  # ((first_row, n_dirs), ...) static


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


def ancestor_dof_mask(m: M.Model, meta) -> 'np.ndarray':
    """Static (nbody, nv) 0/1 mask: dof k on the root->body kinematic chain.

    Lets contact Jacobians for ALL contact points assemble as one batched
    expression instead of per-contact Python loops over ancestor dofs.
    """
    import numpy as np
    mask = np.zeros((m.nbody, m.nv), np.float32)
    for b in range(m.nbody):
        for k in meta.ancestor_dofs[b]:
            mask[b, k] = 1.0
    return mask


def assemble(m: M.Model, meta, qpos, qvel, cdof,
             contact: Optional[Contact],
             site_xpos: Optional[jnp.ndarray] = None) -> \
        Optional[ConstraintSet]:
    """Build the full constraint row set for one configuration.

    Row groups (in sweep order): dof friction loss, tendon equality,
    spatial-tendon limits, joint limits, contacts. The limit and contact
    groups — the bulk on locomotion/manipulation models — are assembled as
    single batched expressions with static index arrays; only the rare
    tendon rows (<=2 per suite model) build row-by-row.
    """
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

    def n_rows_so_far():
        n = 0
        for r in rows_J:
            n += r.shape[0] if r.ndim > 1 else 1
        return n

    dof_iw = (m.dof_invweight0 if m.dof_invweight0 is not None
              else jnp.ones((nv,), dtype))
    body_iw = (m.body_invweight0[:, 0] if m.body_invweight0 is not None
               else jnp.ones((m.nbody,), dtype))

    # ---- dof friction loss (finger spinner hinge) --------------------------
    fl_np = np.asarray(m.dof_frictionloss)
    fl_idx = np.nonzero(fl_np)[0]
    if len(fl_idx):
        kk, bb, dd = kbi(jnp.asarray([0.02, 1.0], dtype),
                         jnp.asarray([0.9, 0.95, 0.001, 0.5, 2.0], dtype),
                         jnp.zeros((), dtype), h)
        J_fl = jnp.asarray(np.eye(nv, dtype=np.float32)[fl_idx], dtype)
        base = n_rows_so_far()
        for i, k in enumerate(fl_idx):
            blocks.append(('friction', base + i))
            friction_bounds.append(m.dof_frictionloss[int(k)])
        rows_J.append(J_fl)
        rows_aref.append(-bb * qvel[fl_idx])
        rows_R.append((1.0 - dd) / dd * dof_iw[fl_idx])
        rows_active.append(jnp.ones((len(fl_idx),), dtype))

    # ---- tendon equality constraints (manipulator hand coupling) -----------
    for (t, solref, solimp) in m.eq_tendon:
        from . import smooth as _smooth
        length = _smooth.fixed_tendon_length(m, qpos, t)
        Jrow = m.tendon_moment[t]
        kk, bb, dd = kbi(jnp.asarray(solref, dtype),
                         jnp.asarray(solimp, dtype), length, h)
        vel = Jrow @ qvel
        blocks.append(('equality', n_rows_so_far()))
        ten_iw = (m.tendon_invweight0[t] if m.tendon_invweight0 is not None
                  else jnp.ones((), dtype))
        rows_J.append(Jrow)
        rows_aref.append(-bb * vel - kk * length)
        rows_R.append((1.0 - dd) / dd * ten_iw)
        rows_active.append(jnp.ones((), dtype))

    # ---- spatial tendon length limits (ball_in_cup string) -----------------
    for entry in m.spatial_tendons:
        s1, s2, limited, lo, hi = entry[:5]
        sten_iw = entry[5] if len(entry) > 5 else 1.0
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
        blocks.append(('limit', n_rows_so_far()))
        rows_J.append(Jrow)
        rows_aref.append(-bb * vel - kk * jnp.minimum(pos, 0.0))
        rows_R.append((1.0 - dd) / dd * jnp.asarray(sten_iw, dtype))
        rows_active.append((pos < 0.0).astype(dtype))

    # ---- joint limits (batched over all limited joints) --------------------
    lim = _limited_joints(m)
    if lim:
        lim_np = np.array(lim)
        qadr = np.array([m.jnt_qposadr[j] for j in lim])
        dadr = np.array([m.jnt_dofadr[j] for j in lim])
        q = qpos[qadr]
        lo = m.jnt_range[lim_np, 0]
        hi = m.jnt_range[lim_np, 1]
        dist_lo = q - lo
        dist_hi = hi - q
        use_lo = dist_lo < dist_hi
        sign = jnp.where(use_lo, 1.0, -1.0).astype(dtype)
        pos = jnp.where(use_lo, dist_lo, dist_hi) - m.jnt_margin[lim_np]
        posc = jnp.minimum(pos, 0.0)
        J_lim = (jnp.zeros((len(lim), nv), dtype)
                 .at[np.arange(len(lim)), dadr].set(sign))
        # kbi indexes solref/solimp along axis 0, so pass them transposed
        # to broadcast over the joint batch.
        k, b, d = kbi(m.jnt_solref[lim_np].T, m.jnt_solimp[lim_np].T,
                      posc, h)
        vel = sign * qvel[dadr]
        base = n_rows_so_far()
        for i in range(len(lim)):
            blocks.append(('limit', base + i))
        rows_J.append(J_lim)
        rows_aref.append(-b * vel - k * posc)
        rows_R.append((1.0 - d) / d * dof_iw[dadr])
        rows_active.append((pos < 0.0).astype(dtype))

    # ---- contacts (batched over all contact points) -------------------------
    pyramids = []
    if contact is not None and len(contact.geom1):
        C = len(contact.geom1)
        body1 = np.array([m.geom_body[g] for g in contact.geom1])
        body2 = np.array([m.geom_body[g] for g in contact.geom2])
        amask = jnp.asarray(ancestor_dof_mask(m, meta), dtype)
        dmask = (amask[body2] - amask[body1])[:, :, None]  # (C, nv, 1)
        # translational point jacobian for every contact at once:
        # J[c, k, :] = cdof[k, 3:] + cross(cdof[k, :3], point[c])
        Jt = cdof[None, :, 3:] + jnp.cross(
            jnp.broadcast_to(cdof[None, :, :3], (C, nv, 3)),
            contact.pos[:, None, :])                       # (C, nv, 3)
        Jc = jnp.einsum('cij,cvj->civ', contact.frame,
                        Jt * dmask)                        # (C, 3, nv)
        pos = jnp.minimum(contact.dist, 0.0)
        k, b, d = kbi(contact.solref.T, contact.solimp.T, pos, h)  # (C,)
        vel = jnp.einsum('civ,v->ci', Jc, qvel)            # (C, 3)
        active = (contact.dist < 0.0).astype(dtype)

        # pair condim: the higher-priority geom dictates; equal priority
        # takes the max (mjModel contact-pair semantics)
        def _pair_condim(g1, g2):
            p1, p2 = m.geom_priority[g1], m.geom_priority[g2]
            if p1 > p2:
                return m.geom_condim[g1]
            if p2 > p1:
                return m.geom_condim[g2]
            return max(m.geom_condim[g1], m.geom_condim[g2])

        cdim = np.array([_pair_condim(g1, g2)
                         for g1, g2 in zip(contact.geom1, contact.geom2)])
        # diagApprox reference weight per contact pair
        iw_pair = body_iw[body1] + body_iw[body2]          # (C,)
        mu1 = contact.friction[:, 0]

        if m.opt.cone == 'elliptic':
            base = n_rows_so_far()
            mu_all = mu1 * jnp.asarray(cdim >= 3, dtype)
            for c in range(C):
                blocks.append(('contact', base + 3 * c))
            mus.append(mu_all)
            aref_con = jnp.stack([-b * vel[:, 0] - k * pos,
                                  -b * vel[:, 1],
                                  -b * vel[:, 2]], axis=1)  # (C, 3)
            R_n = (1.0 - d) / d * iw_pair
            R_t = R_n / m.opt.impratio
            rows_J.append(Jc.reshape(3 * C, nv))
            rows_aref.append(aref_con.reshape(3 * C))
            rows_R.append(jnp.stack([R_n, R_t, R_t], axis=1).reshape(-1))
            rows_active.append(jnp.repeat(active, 3))
        else:
            # MuJoCo-default pyramidal cone: per friction direction i the
            # two facet rows are J_n ± mu_i J_i with f >= 0; all facets of
            # a contact share R = (1-d)/d * iw_pair * 2 mu1^2 (1+mu1^2)
            # (probed against mjData.efc_R; engine docs "pyramidal cone").
            need_rot = bool((cdim > 3).any())
            if need_rot:
                Jr = jnp.einsum(
                    'cij,cvj->civ', contact.frame,
                    jnp.broadcast_to(cdof[None, :, :3],
                                     (C, nv, 3)) * dmask)  # (C, 3, nv)
                vel_r = jnp.einsum('civ,v->ci', Jr, qvel)
            R_con = ((1.0 - d) / d * iw_pair
                     * 2.0 * mu1 * mu1 * (1.0 + mu1 * mu1))
            for grp_dim in sorted(set(cdim.tolist())):
                idx = np.nonzero(cdim == grp_dim)[0]
                Jn = Jc[idx, 0]                            # (G, nv)
                aref_n = -b[idx] * vel[idx, 0] - k[idx] * pos[idx]
                base = n_rows_so_far()
                if grp_dim == 1:
                    # frictionless: a single non-negative normal row
                    for gi, c in enumerate(idx):
                        blocks.append(('limit', base + gi))
                        pyramids.append((int(c), base + gi, 0))
                    rows_J.append(Jn)
                    rows_aref.append(aref_n)
                    rows_R.append((1.0 - d[idx]) / d[idx] * iw_pair[idx])
                    rows_active.append(active[idx])
                    mus.append(mu1[idx] * 0)
                    continue
                dirs = []                 # (J_dir (G,nv), mu_dir (G,))
                dirs.append((Jc[idx, 1], mu1[idx]))
                dirs.append((Jc[idx, 2], mu1[idx]))
                if grp_dim >= 4:
                    dirs.append((Jr[idx, 0], contact.friction[idx, 1]))
                if grp_dim >= 6:
                    dirs.append((Jr[idx, 1], contact.friction[idx, 2]))
                    dirs.append((Jr[idx, 2], contact.friction[idx, 2]))
                ndir = len(dirs)
                # rows per contact: (d0+, d0-, d1+, d1-, ...) contiguous
                facet_J = []
                facet_aref = []
                for (Jd, mu_d) in dirs:
                    vd = Jd @ qvel
                    facet_J.append(Jn + mu_d[:, None] * Jd)
                    facet_J.append(Jn - mu_d[:, None] * Jd)
                    facet_aref.append(aref_n - b[idx] * mu_d * vd)
                    facet_aref.append(aref_n + b[idx] * mu_d * vd)
                # interleave to per-contact-contiguous layout
                FJ = jnp.stack(facet_J, axis=1)            # (G, 2ndir, nv)
                FA = jnp.stack(facet_aref, axis=1)         # (G, 2ndir)
                G = len(idx)
                for gi, c in enumerate(idx):
                    pyramids.append((int(c), base + 2 * ndir * gi, ndir))
                    for r_ in range(2 * ndir):
                        blocks.append(('facet',
                                       base + 2 * ndir * gi + r_))
                rows_J.append(FJ.reshape(2 * ndir * G, nv))
                rows_aref.append(FA.reshape(2 * ndir * G))
                rows_R.append(jnp.repeat(R_con[idx], 2 * ndir))
                rows_active.append(jnp.repeat(active[idx], 2 * ndir))
                mus.append(mu1[idx])

    if not rows_J:
        return None

    J = jnp.concatenate([jnp.atleast_2d(r) for r in rows_J])
    aref = jnp.concatenate([jnp.atleast_1d(r) for r in rows_aref])
    Rrows = jnp.concatenate([jnp.atleast_1d(r) for r in rows_R])
    active = jnp.concatenate([jnp.atleast_1d(r) for r in rows_active])
    mu = (jnp.concatenate([jnp.atleast_1d(x) for x in mus]) if mus
          else jnp.zeros((0,), dtype))
    return ConstraintSet(J, aref, Rrows, active, blocks, mu,
                         tuple(friction_bounds), tuple(pyramids))


def solve(m: M.Model, cs: Optional[ConstraintSet], qM_chol,
          qacc_smooth: jnp.ndarray,
          iterations: Optional[int] = None,
          f0: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """PGS solve -> (qfrc_constraint (nv,), row forces f (nr,) or None).

    ``f0`` warm-starts the sweep from a previous solution (typically the
    prior substep's efc_force); rows inactive in THIS step's constraint
    set are masked out so stale forces cannot leak through.
    """
    if cs is None:
        return jnp.zeros_like(qacc_smooth), None
    iterations = iterations or m.opt.solver_iterations

    MinvJT = jax.scipy.linalg.cho_solve(qM_chol, cs.J.T)   # (nv, nr)
    A = cs.J @ MinvJT                                      # (nr, nr)
    Ad = A + jnp.diag(cs.R)
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
            if kind in ('limit', 'facet'):
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

    if f0 is None:
        f0 = jnp.zeros((n_rows,), qacc_smooth.dtype)
    else:
        f0 = f0 * cs.active
    f = jax.lax.fori_loop(0, iterations, sweep, f0)
    return cs.J.T @ f, f


def _row_structure(cs: ConstraintSet):
    """Static row-type index arrays derived from the block list."""
    import numpy as np
    nonneg, box_rows, con0 = [], [], []
    for kind, i0 in cs.blocks:
        if kind in ('limit', 'facet'):
            nonneg.append(i0)
        elif kind == 'friction':
            box_rows.append(i0)
        elif kind == 'contact':
            con0.append(i0)
    return (np.array(nonneg, np.int64), np.array(box_rows, np.int64),
            np.array(con0, np.int64))


def solve_apgd(m: M.Model, cs: Optional[ConstraintSet], qM_chol,
               qacc_smooth: jnp.ndarray,
               iterations: Optional[int] = None,
               f0: Optional[jnp.ndarray] = None,
               power_v0: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Accelerated projected gradient descent on the dual QP.

    Solves the same problem as :func:`solve` —
    min 1/2 f'(A+R)f - f'rhs over the constraint cone — but every
    iteration is ONE dense (nr, nr) matvec plus a closed-form projection,
    all rows in parallel. Under ``vmap`` over an env batch the matvec is a
    batched matmul on the MXU, whereas Gauss-Seidel's row-sequential sweep
    is thousands of latency-bound scalar ops. Friction cones use the exact
    second-order-cone projection; Nesterov momentum with adaptive restart
    recovers most of GS's per-iteration convergence.

    ``power_v0`` warm-starts the step-size power iteration from the
    previous substep's dominant-eigenvector estimate (returned as the
    third element). The preconditioned constraint matrix is a smooth
    function of qpos, so across 2.5 ms substeps the leading eigenspace
    barely moves: a handful of warm iterations reach the accuracy that a
    cold start needs 24 for, saving ~20 (nr, nr) matvecs per substep.

    Returns ``(qfrc_constraint (nv,), row forces f (nr,), power_v (nr,))``.
    """
    if cs is None:
        return jnp.zeros_like(qacc_smooth), None, None
    iterations = iterations or 2 * m.opt.solver_iterations
    dtype = qacc_smooth.dtype

    from ..ops import apgd_solve as _ker

    nr = cs.J.shape[0]
    nv_dim = cs.J.shape[1]
    eq_rows = tuple(int(i0) for kind, i0 in cs.blocks
                    if kind == 'equality')
    # Factored regime: row counts past the resident-Ad kernel's VMEM
    # wall (humanoid: nr=303). The dual matrix is never materialized —
    # neither on the host (the (B, nr, nr) batch alone is ~190 MB at
    # humanoid production sizes, re-read from HBM every iteration by
    # the XLA fallback) nor in the kernel, which holds the factors
    # J~ (nr, nv) and M^-1 (nv, nv) resident instead. Equality rows
    # need full Ad rows for their Gauss-Seidel polish, so models with
    # them keep the materialized path.
    use_factored = (nr > _ker.MAX_NR
                    and _ker.factored_fits(nr, nv_dim)
                    and not eq_rows)

    MinvJT = jax.scipy.linalg.cho_solve(qM_chol, cs.J.T)   # (nv, nr)
    if use_factored:
        Ad = None
        d_all0 = (jnp.einsum('rv,vr->r', cs.J, MinvJT,
                             precision=jax.lax.Precision.HIGHEST)
                  + cs.R)
    else:
        A = cs.J @ MinvJT                                  # (nr, nr)
        Ad = A + jnp.diag(cs.R)
        d_all0 = jnp.diag(Ad)
    rhs = (cs.aref - cs.J @ qacc_smooth) * cs.active

    nonneg, box_rows, con0 = _row_structure(cs)
    bounds = (jnp.stack([jnp.asarray(b, dtype)
                         for b in cs.friction_bounds])
              if len(box_rows) else None)

    # Jacobi preconditioning: stiff equality rows (tendon couplings) and
    # heavy-mass contacts give Ad a condition number that stalls plain
    # projected gradient. Solve in f_s = D^(1/2) f with D = diag(Ad);
    # friction-cone blocks share their NORMAL row's scale so the cone
    # projection stays exact in the scaled variables. Rows with a
    # vanishing diagonal (near-zero constraint Jacobians, e.g. contacts
    # between nearly co-moving geoms) are dropped outright — scaling BY
    # them would blow up the spectral radius and stall every other row.
    d_all = d_all0
    if len(con0):
        block_scale = d_all[con0]
        d_all = d_all.at[con0 + 1].set(block_scale)
        d_all = d_all.at[con0 + 2].set(block_scale)
    degenerate = d_all < 1e-9 * jnp.max(d_all)
    s_inv = jnp.where(degenerate, 0.0,
                      1.0 / jnp.sqrt(jnp.where(degenerate, 1.0, d_all)))
    act_m = cs.active.astype(dtype)
    if not use_factored:
        Ad = Ad * s_inv[:, None] * s_inv[None, :]
        # Active-set masking: the projection pins inactive rows to zero
        # force, but leaving their columns in Ad inflates the power-
        # iteration step-size estimate to the spectral radius of the
        # FULL row set (4.4k rows on humanoid_cmu, L~60) — the active
        # subproblem then converges at (1 - 1/L) per iteration and
        # visibly undershoots stiff limit rows within the iteration cap
        # (observed: toe-limit force 12.4 vs the exact dual's 20.3, a
        # 2e-3/step qpos parity break). Masking Ad down to the active
        # submatrix leaves the fixed point unchanged and makes L the
        # ACTIVE set's spectral radius.
        Ad = Ad * (act_m[:, None] * act_m[None, :])
    rhs = rhs * s_inv
    if bounds is not None:
        safe = jnp.where(s_inv[box_rows] > 0, s_inv[box_rows], 1.0)
        bounds = bounds / safe

    # The iterate (power-iteration step size + Nesterov APGD loop) runs
    # behind a custom_vmap boundary: per-env it is the XLA while loop
    # below (_apgd_iterate_impl); under vmap over an env batch on TPU it
    # dispatches to the fused Pallas kernel (ops/apgd_solve.py) that
    # keeps each env block's Ad (or, in the factored regime, J~ and
    # M^-1) resident in VMEM across ALL iterations instead of re-reading
    # batched matrices from HBM every matvec.
    mu_full = (jnp.zeros((nr,), dtype).at[con0].set(
        jnp.asarray(cs.mu, dtype)) if len(con0)
        else jnp.zeros((nr,), dtype))
    bounds_full = (jnp.zeros((nr,), dtype).at[box_rows].set(bounds)
                   if bounds is not None else jnp.zeros((nr,), dtype))
    if f0 is None:
        f0s = jnp.zeros((nr,), dtype)
    else:
        # warm start: previous solution mapped into the scaled,
        # active-masked iteration space (f_s = f / s_inv; degenerate
        # rows were dropped from the preconditioner and start at 0);
        # the iterate projects it before the first step.
        f0s = jnp.where(s_inv > 0, f0 * cs.active /
                        jnp.where(s_inv > 0, s_inv, 1.0), 0.0)
    cold = power_v0 is None
    v0 = jnp.zeros((nr,), dtype) if cold else power_v0

    if use_factored:
        # scaled+masked Jacobian: Ad = J~ M^-1 J~' + diag(Rs) with the
        # row scale and active mask folded into J~ (mask^2 == mask, so
        # this equals the masked scaled dual matrix exactly)
        sa = s_inv * act_m
        J_s = cs.J * sa[:, None]
        Minv = jax.scipy.linalg.cho_solve(
            qM_chol, jnp.eye(cs.J.shape[1], dtype=dtype))
        Rs = s_inv * s_inv * cs.R * act_m
        diag_s = s_inv * s_inv * d_all0 * act_m
        iterate = _apgd_dispatch_factored(
            tuple(int(i) for i in nonneg),
            tuple(int(i) for i in box_rows),
            tuple(int(i) for i in con0), int(iterations), cold)
        f, v = iterate(J_s, Minv, Rs, diag_s, rhs, f0s, v0, act_m,
                       mu_full, bounds_full)
        Adf = J_s @ (Minv @ (J_s.T @ f)) + Rs * f
    else:
        iterate = _apgd_dispatch(tuple(int(i) for i in nonneg),
                                 tuple(int(i) for i in box_rows),
                                 tuple(int(i) for i in con0),
                                 int(iterations), cold, eq_rows)
        f, v = iterate(Ad, rhs, f0s, v0, act_m, mu_full, bounds_full)
        Adf = Ad @ f
    # Divergence safeguard: the dual objective phi(f) = 1/2 f'Ad f -
    # f'rhs satisfies phi(f*) <= phi(0) = 0 (zero force is feasible for
    # every row type), so phi > 0 certifies the iterate DIVERGED rather
    # than converged. That can happen when the warm-started power
    # iteration plateaus on a secondary eigenvalue after the active
    # contact set changes (near-degenerate facet spectra): the Rayleigh
    # staleness check passes while 1.5*r8 still understates lambda_max,
    # the 1/L step oversteps, and the iterate grows geometrically
    # (observed on stacker/manipulator TPU rollouts: |qvel| 6.5 -> 2.8e6
    # in one control step, rounding-sensitive — the identical state
    # re-solved in a different fusion context converges). Zero force for
    # one substep (smooth dynamics) is benign and the next substep
    # re-solves cold. Costs one matvec per solve (~2% of the iterate).
    phi = 0.5 * jnp.sum(f * Adf) - jnp.sum(f * rhs)
    # NaN-safe predicate: a hard overflow inside the iterate makes phi
    # NaN (inf - inf), and `phi > 0` would read False — test for the
    # GOOD certificate (phi <= 0 and finite forces) instead
    bad = jnp.logical_not(jnp.logical_and(
        phi <= 0.0, jnp.all(jnp.isfinite(f))))
    f = jnp.where(bad, jnp.zeros_like(f), f)
    # a diverged carried eigenvector would poison the NEXT solve's warm
    # power start; drop it back to the deterministic flat start too
    v = jnp.where(bad, jnp.zeros_like(v), v)
    f = f * s_inv                      # back to unscaled forces
    return cs.J.T @ f, f, v


@functools.lru_cache(maxsize=128)
def _apgd_dispatch(nonneg, box_rows, con0, iterations: int, cold: bool,
                   eq_rows=(), trace_safe_l: bool = False):
    """custom_vmap APGD iterate for one static row structure.

    ``trace_safe_l`` switches the warm-start staleness fallback bound
    from the inf-norm row sum to the trace bound (lambda_max <= trace
    for PSD) — the factored dispatch uses it because its Pallas kernel
    cannot form row sums of a matrix it never materializes, and the
    fallback impl must match the kernel bit-for-bit.

    Unbatched: the XLA power-iteration + while-loop iterate (exact
    original semantics). Batched (the production path — `vmap(step)`
    over the env batch): the fused Pallas kernel when on TPU, f32, and
    the row count fits the envs-on-lanes layout; otherwise vmap of the
    unbatched iterate.
    """
    import numpy as _np
    from jax import custom_batching

    nonneg_a = _np.asarray(nonneg, _np.int64)
    box_a = _np.asarray(box_rows, _np.int64)
    con0_a = _np.asarray(con0, _np.int64)

    def impl(Ad, rhs, f0s, v0, active, mu_full, bounds_full):
        dtype = rhs.dtype
        nr = rhs.shape[0]

        # Step size from the preconditioned spectral radius (power
        # iteration). Redundant coplanar facet rows (plane-box: 4
        # coincident-normal contacts x 4 facets) make the leading
        # eigenspace nearly degenerate; 12 unguarded iterations can
        # underestimate lambda_max enough that 1/L oversteps and the
        # iteration DIVERGES (observed: qacc -> 1e19). More iterations
        # plus a 1.5x safety margin keeps the step inside the
        # convergence region at negligible cost (one matvec each).
        def power(_, v):
            w = Ad @ v
            return w / jnp.maximum(jnp.linalg.norm(w), 1e-12)
        v_flat = jnp.ones((nr,), dtype) / (nr ** 0.5)
        if cold:
            v = jax.lax.fori_loop(0, 24, power, v_flat)
            L = 1.5 * jnp.maximum(v @ (Ad @ v), 1.0)  # unit diag -> L>=1
        else:
            # warm start: renormalize the carried estimate, fall back to
            # the flat vector if it degenerated (all-zero after masking)
            nrm = jnp.linalg.norm(v0)
            vv = jnp.where(nrm > 1e-12, v0 / jnp.maximum(nrm, 1e-12),
                           v_flat)
            v = jax.lax.fori_loop(0, 6, power, vv)
            r6 = v @ (Ad @ v)
            v = jax.lax.fori_loop(0, 2, power, v)
            r8 = v @ (Ad @ v)
            # Rayleigh-quotient staleness check: under power iteration
            # on a symmetric PSD matrix the quotient rises monotonically
            # toward lambda_max, so a quotient still moving after 8 warm
            # iterations means the carried eigenvector is stale (the
            # active contact set changed between substeps) and 1.5*r8
            # may understate lambda_max enough for the 1/L APGD step to
            # overshoot. For such solves use the certain upper bound
            # max_i sum_j |Ad_ij| (the induced inf-norm of a symmetric
            # matrix bounds its spectral radius): guaranteed convergence
            # at a somewhat smaller step, paid only on contact-set-change
            # substeps. (A lax.cond with extra iterations would not
            # help: this path is vmapped over envs, so cond lowers to
            # select and both branches would always run.)
            if trace_safe_l:
                safe_L = jnp.maximum(jnp.trace(Ad), 1.0)
            else:
                safe_L = jnp.maximum(
                    jnp.max(jnp.sum(jnp.abs(Ad), axis=1)), 1.0)
            stale = (r8 - r6) > 0.02 * jnp.maximum(r8, 1e-12)
            L = jnp.where(stale, safe_L, 1.5 * jnp.maximum(r8, 1.0))

        # Projection as dense masked math on the full row vector: the
        # loop body must not gather/scatter (under vmap each .at[i].set
        # is a batched scatter — dozens of latency-bound ops per
        # iteration, times ~60 iterations times n_substeps). Static
        # row-type masks turn the whole projection into a handful of
        # (nr,)-wide selects; friction cones read their tangent rows
        # through jnp.roll (contact blocks are contiguous [normal, t1,
        # t2] triples) and write back through rolled masks, so the cone
        # projection is exact and gather-free.
        m_nonneg = (jnp.asarray(_np.isin(_np.arange(nr), nonneg_a))
                    if len(nonneg_a) else None)
        m_box = (jnp.asarray(_np.isin(_np.arange(nr), box_a))
                 if len(box_a) else None)
        if len(con0_a):
            m_n = jnp.asarray(_np.isin(_np.arange(nr), con0_a))
            m_t1 = jnp.asarray(_np.isin(_np.arange(nr), con0_a + 1))
            m_t2 = jnp.asarray(_np.isin(_np.arange(nr), con0_a + 2))

        def proj(f):
            if m_nonneg is not None:
                f = jnp.where(m_nonneg, jnp.maximum(f, 0.0), f)
            if m_box is not None:
                f = jnp.where(m_box,
                              jnp.clip(f, -bounds_full, bounds_full), f)
            if len(con0_a):
                ft1 = jnp.roll(f, -1)             # tangent rows, aligned
                ft2 = jnp.roll(f, -2)             # to their normal row
                t = jnp.sqrt(ft1 * ft1 + ft2 * ft2)
                inside = t <= mu_full * f
                apex = mu_full * t + f <= 0.0
                fn_s = jnp.where(inside, f,
                                 jnp.where(apex, 0.0,
                                           (f + mu_full * t)
                                           / (1.0 + mu_full * mu_full)))
                tscale = jnp.where(inside, 1.0,
                                   jnp.where(apex, 0.0,
                                             mu_full * fn_s
                                             / jnp.maximum(t, 1e-12)))
                tscale = jnp.where(m_n, tscale, 1.0)
                f = jnp.where(m_n, fn_s, f)
                f = f * jnp.where(m_t1, jnp.roll(tscale, 1), 1.0)
                f = f * jnp.where(m_t2, jnp.roll(tscale, 2), 1.0)
            return f * active

        f0 = proj(f0s)

        # Early termination (mjOption tolerance analogue): with
        # per-substep warm starting most steady-state solves converge in
        # a fraction of the iteration cap; stop when the iterate stops
        # moving relative to its size. Under vmap this lowers to a
        # batched while that runs until every env in the batch has
        # converged — still a large win, since the cap is sized for the
        # worst transient, not the common case.
        tol2 = jnp.asarray(1e-12, dtype)     # (1e-6 relative L2)^2

        def cond(carry):
            f, y, theta, it, done = carry
            return jnp.logical_and(it < iterations, jnp.logical_not(done))

        # Equality rows are unbounded and can be extremely stiff: the
        # manipulator finger-coupling tendon has J M^-1 J' ~ 2e5 (near-
        # massless fingers), and even after Jacobi scaling the 1/L
        # gradient step crawls toward its optimum (~1000 iterations to
        # converge vs the ~60 cap; measured force -0.025 vs the exact
        # dual's -0.4418, which real MuJoCo's Newton solver attains —
        # engine_core_constraint.c solves equality rows implicitly).
        # Because these rows have no cone to project onto, their
        # conditional optimum given all other forces is closed-form;
        # interleave an exact Gauss-Seidel update on them each
        # iteration (scaled diagonal is exactly 1, so the row update is
        # f_e -= Ad[e].f - rhs[e]). One (nr,) dot per equality row per
        # iteration — negligible next to the (nr, nr) matvec.
        eq_hots = [jnp.zeros((nr,), dtype).at[e].set(1.0)
                   for e in eq_rows]

        def eq_polish(f):
            # masked by the row's `active` entry so an inactive or
            # degenerate equality row can never accumulate force here
            # (proj already zeroes it; the polish must not resurrect it)
            for e, hot in zip(eq_rows, eq_hots):
                f = f - hot * active[e] * (Ad[e] @ f - rhs[e])
            return f

        def body(carry):
            f, y, theta, it, done = carry
            g = Ad @ y - rhs
            f_new = proj(y - g / L)
            if eq_rows:
                f_new = eq_polish(f_new)
            theta_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * theta * theta))
            beta = (theta - 1.0) / theta_new
            # adaptive restart: drop momentum when it points against
            # descent
            restart = jnp.sum((y - f_new) * (f_new - f)) > 0.0
            beta = jnp.where(restart, 0.0, beta)
            y_new = f_new + beta * (f_new - f)
            d2 = jnp.sum((f_new - f) ** 2)
            done = d2 <= tol2 * (1e-12 + jnp.sum(f_new * f_new))
            return (f_new, y_new, jnp.where(restart, 1.0, theta_new),
                    it + 1, done)

        f, _, _, _, _ = jax.lax.while_loop(
            cond, body, (f0, f0, jnp.ones((), dtype),
                         jnp.zeros((), jnp.int32), jnp.zeros((), jnp.bool_)))
        return f, v

    cv = custom_batching.custom_vmap(impl)

    @cv.def_vmap
    def _rule(axis_size, in_batched, Ad, rhs, f0s, v0, active, mu_full,
              bounds_full):
        from ..ops import apgd_solve as _ker

        ad_b, rhs_b, f0_b, v0_b, act_b, mu_b, bnd_b = in_batched

        def bcast(x, b):
            return (x if b
                    else jnp.broadcast_to(x, (axis_size,) + x.shape))

        import os
        use_kernel = (os.environ.get('MBRL_APGD_KERNEL', '1') != '0'
                      and jax.devices()[0].platform in ('tpu', 'axon')
                      and ad_b and Ad.ndim == 3
                      and Ad.shape[-1] <= _ker.MAX_NR
                      and Ad.dtype == jnp.float32
                      and not mu_b and not bnd_b
                      and axis_size >= 64)
        if use_kernel:
            f, v = _ker.apgd_iterate_batched(
                Ad, bcast(rhs, rhs_b), bcast(f0s, f0_b),
                bcast(v0, v0_b), bcast(active, act_b),
                mu_full, bounds_full,
                nonneg=nonneg, box_rows=box_rows, con0=con0,
                iterations=iterations, cold=cold, eq_rows=eq_rows)
        else:
            f, v = jax.vmap(impl)(
                bcast(Ad, ad_b), bcast(rhs, rhs_b), bcast(f0s, f0_b),
                bcast(v0, v0_b), bcast(active, act_b),
                bcast(mu_full, mu_b), bcast(bounds_full, bnd_b))
        return (f, v), (True, True)

    cv.impl_fn = impl     # reused by the factored dispatch's XLA path
    return cv


@functools.lru_cache(maxsize=128)
def _apgd_dispatch_factored(nonneg, box_rows, con0, iterations: int,
                            cold: bool):
    """custom_vmap APGD iterate over FACTORED inputs (J~, M^-1, Rs).

    For models whose (nr, nr) dual matrix exceeds the resident kernel's
    VMEM wall (ops/apgd_solve.py MAX_NR). Unbatched: materialize the
    single-env Ad (cheap) and run the exact XLA iterate. Batched on
    TPU: the factored Pallas kernel — the (B, nr, nr) batch is never
    built. Batched elsewhere (CPU tests): vmap of the materialized
    impl, which matches the old fallback's semantics and cost.
    """
    from jax import custom_batching

    base = _apgd_dispatch(nonneg, box_rows, con0, iterations, cold, (),
                          trace_safe_l=True)
    base_impl = base.impl_fn

    def impl_f(J_s, Minv, Rs, diag_s, rhs, f0s, v0, active, mu_full,
               bounds_full):
        # pinned precision: on TPU the default bf16 matmul pass loses
        # ~3 digits materializing Ad, visibly diverging from the f32
        # Pallas kernel; production already runs under forward()'s
        # highest-precision scope, this makes the impl standalone-safe
        with jax.default_matmul_precision('highest'):
            Ad = (J_s @ Minv) @ J_s.T + jnp.diag(Rs)
        return base_impl(Ad, rhs, f0s, v0, active, mu_full, bounds_full)

    cv = custom_batching.custom_vmap(impl_f)

    @cv.def_vmap
    def _rule(axis_size, in_batched, J_s, Minv, Rs, diag_s, rhs, f0s, v0,
              active, mu_full, bounds_full):
        from ..ops import apgd_solve as _ker

        (j_b, mi_b, rs_b, dg_b, rhs_b, f0_b, v0_b, act_b, mu_b,
         bnd_b) = in_batched

        def bcast(x, b):
            return (x if b
                    else jnp.broadcast_to(x, (axis_size,) + x.shape))

        import os
        use_kernel = (os.environ.get('MBRL_APGD_KERNEL', '1') != '0'
                      and jax.devices()[0].platform in ('tpu', 'axon')
                      and j_b and J_s.ndim == 3
                      and J_s.dtype == jnp.float32
                      and not mu_b and not bnd_b
                      and axis_size >= 64)
        if use_kernel:
            f, v = _ker.apgd_iterate_factored(
                J_s, bcast(Minv, mi_b), bcast(Rs, rs_b),
                bcast(diag_s, dg_b), bcast(rhs, rhs_b),
                bcast(f0s, f0_b), bcast(v0, v0_b),
                bcast(active, act_b), mu_full, bounds_full,
                nonneg=nonneg, box_rows=box_rows, con0=con0,
                iterations=iterations, cold=cold)
        else:
            f, v = jax.vmap(impl_f)(
                bcast(J_s, j_b), bcast(Minv, mi_b), bcast(Rs, rs_b),
                bcast(diag_s, dg_b), bcast(rhs, rhs_b),
                bcast(f0s, f0_b), bcast(v0, v0_b), bcast(active, act_b),
                bcast(mu_full, mu_b), bcast(bounds_full, bnd_b))
        return (f, v), (True, True)

    return cv


def contact_forces(cs: Optional[ConstraintSet], f: Optional[jnp.ndarray],
                   n_contacts: int, dtype) -> jnp.ndarray:
    """Extract per-contact (normal, t1, t2) forces from the row solution.

    Elliptic rows carry the forces directly; pyramidal contacts
    reconstruct them from the facets: fn = sum(facets),
    ft_i = mu_i * (f_i+ - f_i-)  (MuJoCo pyramid decomposition).
    """
    if cs is None or f is None:
        return jnp.zeros((n_contacts, 3), dtype)
    import numpy as np
    if cs.pyramids:
        out = jnp.zeros((n_contacts, 3), dtype)
        for ci, (c, i0, ndir) in enumerate(cs.pyramids):
            if ndir == 0:
                out = out.at[c, 0].set(f[i0])
                continue
            facets = f[i0:i0 + 2 * ndir]
            fn = facets.sum()
            mu = cs.mu[ci]
            ft1 = mu * (facets[0] - facets[1])
            ft2 = mu * (facets[2] - facets[3])
            out = out.at[c].set(jnp.stack([fn, ft1, ft2]))
        return out
    i0s = np.array([i0 for kind, i0 in cs.blocks if kind == 'contact'],
                   dtype=np.int64)
    if not len(i0s):
        return jnp.zeros((n_contacts, 3), dtype)
    return f[i0s[:, None] + np.arange(3)]
