"""Forward dynamics, constraint solve, and integration: the jittable `step`.

This is the TPU-native replacement for the reference's process-resident C hot
loop — ``mj_step2 + mj_step1`` reached through ctypes at
``dm_control/dm_control/mujoco/engine.py:133-150``. Everything here is a pure
function of ``(Model, State, ctrl)`` so the whole env batch jits into one XLA
program: `vmap(step)` over thousands of env instances, `lax.scan` over
substeps and planning horizons.

Semantics intentionally preserved from MuJoCo 2.0:
  * 'Euler' integrator = semi-implicit Euler with *implicit* joint damping:
    v' = v + h * (M + h*diag(B))^-1 * f_total_explicit.
  * 'RK4' = classic Runge-Kutta on (qpos, qvel) with 4 full forward passes.
  * Joint limits are soft constraints with solref/solimp impedance, solved by
    a fixed-iteration projected Gauss-Seidel (static constraint count, so the
    solve unrolls into a fixed XLA graph — no dynamic shapes).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from . import math as pm
from . import model as M
from . import smooth


# --------------------------------------------------------------------------
# Constraint impedance (solref / solimp), shared with the contact solver
# --------------------------------------------------------------------------

def impedance(solimp: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """MuJoCo solimp impedance d(pos): dmin..dmax over `width` of violation."""
    dmin, dmax, width, mid, power = (solimp[0], solimp[1], solimp[2],
                                     solimp[3], solimp[4])
    x = jnp.clip(jnp.abs(pos) / jnp.maximum(width, 1e-10), 0.0, 1.0)
    lo = mid * (x / mid) ** power
    hi = 1.0 - (1.0 - mid) * ((1.0 - x) / (1.0 - mid)) ** power
    y = jnp.where(x < mid, lo, hi)
    return dmin + y * (dmax - dmin)


def kbi(solref: jnp.ndarray, solimp: jnp.ndarray, pos: jnp.ndarray):
    """Stiffness k, damping b, impedance d for one constraint row."""
    d = impedance(solimp, pos)
    dmax = solimp[1]
    timeconst, dampratio = solref[0], solref[1]
    b = 2.0 / (dmax * timeconst)
    k = d / (dmax * dmax * timeconst * timeconst * dampratio * dampratio)
    return k, b, d


# --------------------------------------------------------------------------
# Joint-limit constraints (static count = number of limited scalar joints)
# --------------------------------------------------------------------------

def _limited_joints(m: M.Model) -> Tuple[int, ...]:
    if m.opt.disableflags & M.DSBL_LIMIT:
        return ()
    return tuple(j for j in range(m.njnt)
                 if m.jnt_limited[j] and m.jnt_type[j] in (M.SLIDE, M.HINGE))


def limit_rows(m: M.Model, qpos: jnp.ndarray):
    """Build limit-constraint rows: (dof index, sign, pos, solref, solimp).

    One row per limited joint; the violated side is selected with `where`
    so the row count is static.
    """
    joints = _limited_joints(m)
    if not joints:
        return None
    dofs, signs, poss, solrefs, solimps = [], [], [], [], []
    for j in joints:
        qadr, dadr = m.jnt_qposadr[j], m.jnt_dofadr[j]
        lo, hi = m.jnt_range[j, 0], m.jnt_range[j, 1]
        dist_lo = qpos[qadr] - lo
        dist_hi = hi - qpos[qadr]
        use_lo = dist_lo < dist_hi
        signs.append(jnp.where(use_lo, 1.0, -1.0).astype(qpos.dtype))
        poss.append(jnp.where(use_lo, dist_lo, dist_hi)
                    - m.jnt_margin[j])
        dofs.append(dadr)
        solrefs.append(m.jnt_solref[j])
        solimps.append(m.jnt_solimp[j])
    return (tuple(dofs), jnp.stack(signs), jnp.stack(poss),
            jnp.stack(solrefs), jnp.stack(solimps))


def solve_limits(m: M.Model, qM_chol, qpos, qvel, qacc_smooth):
    """Projected Gauss-Seidel on the soft limit constraints.

    Returns qfrc_constraint (nv,). Unrolls to nothing when the model has no
    limited joints (static branch).
    """
    rows = limit_rows(m, qpos)
    dtype = qpos.dtype
    if rows is None:
        return jnp.zeros(m.nv, dtype)
    dofs, signs, poss, solrefs, solimps = rows
    nl = len(dofs)

    # Jacobian J: (nl, nv), rows = +-e_dof
    J = jnp.zeros((nl, m.nv), dtype)
    for i, d in enumerate(dofs):
        J = J.at[i, d].set(signs[i])

    # A = J M^-1 J^T  (+ regularizer R from impedance)
    MinvJT = jax.scipy.linalg.cho_solve(qM_chol, J.T)
    A = J @ MinvJT

    k = jnp.zeros(nl, dtype)
    b = jnp.zeros(nl, dtype)
    dimp = jnp.zeros(nl, dtype)
    for i in range(nl):
        ki, bi, di = kbi(solrefs[i], solimps[i], poss[i])
        k = k.at[i].set(ki)
        b = b.at[i].set(bi)
        dimp = dimp.at[i].set(di)

    active = (poss < 0.0).astype(dtype)
    vel = J @ qvel
    aref = -b * vel - k * poss
    R = (1.0 - dimp) / jnp.maximum(dimp, 1e-8) * jnp.maximum(
        jnp.diag(A), 1e-10)
    Ad = A + jnp.diag(R)
    rhs = (aref - J @ qacc_smooth) * active

    diag = jnp.maximum(jnp.diag(Ad), 1e-10)

    def pgs_iter(f, _):
        for i in range(nl):
            res = Ad[i] @ f - rhs[i]
            fi = jnp.maximum(0.0, f[i] - res / diag[i])
            f = f.at[i].set(fi * active[i])
        return f, None

    f0 = jnp.zeros(nl, dtype)
    f, _ = jax.lax.scan(pgs_iter, f0, None,
                        length=m.opt.solver_iterations)
    return J.T @ f


# --------------------------------------------------------------------------
# Forward dynamics
# --------------------------------------------------------------------------

def forward(m: M.Model, state: M.State, ctrl: jnp.ndarray,
            contact_fn=None) -> M.Data:
    """Full forward pass: kinematics -> forces -> constrained qacc.

    `contact_fn(m, data_partial, qM_chol, qacc_smooth) -> qfrc` optionally
    adds contact constraint forces (installed by physics.collision).
    """
    meta = smooth.tree_meta(m)
    qpos, qvel = state.qpos, state.qvel

    (xpos, xquat, xmat, geom_xpos, geom_xmat, site_xpos,
     xanchor, xaxis) = smooth.kinematics(m, qpos, meta)
    xipos = smooth.com_positions(m, xpos, xquat)
    cdof = smooth.motion_subspace(m, xquat, xanchor, xaxis, meta)
    cinert = smooth.body_spatial_inertia(m, xquat, xipos)
    qM = smooth.crba(m, cdof, cinert, meta)
    cvel, cdof_dot = smooth.velocities(m, qvel, cdof, meta)

    gravity_on = not (m.opt.disableflags & M.DSBL_GRAVITY)
    qfrc_bias = smooth.rnea_bias(m, qvel, cdof, cdof_dot, cvel, cinert,
                                 meta, gravity_on)
    qfrc_spring = smooth.spring_force(m, qpos)
    qfrc_damping = smooth.damping_force(m, qvel)
    qfrc_passive = qfrc_spring + qfrc_damping
    actuator_force, qfrc_actuator = smooth.actuation(m, qpos, qvel, ctrl)

    qfrc_smooth = qfrc_passive + qfrc_actuator - qfrc_bias
    qM_chol = jax.scipy.linalg.cho_factor(qM)
    qacc_smooth = jax.scipy.linalg.cho_solve(qM_chol, qfrc_smooth)

    data = M.Data(
        xpos=xpos, xquat=xquat, xipos=xipos, ximat=xmat,
        geom_xpos=geom_xpos, geom_xmat=geom_xmat, site_xpos=site_xpos,
        xanchor=xanchor, xaxis=xaxis, cdof=cdof, cvel=cvel,
        qM=qM, qfrc_bias=qfrc_bias, qfrc_passive=qfrc_passive,
        qfrc_actuator=qfrc_actuator,
        qfrc_constraint=jnp.zeros(m.nv, qpos.dtype),
        qacc=qacc_smooth, actuator_force=actuator_force)

    qfrc_constraint = solve_limits(m, qM_chol, qpos, qvel, qacc_smooth)
    if contact_fn is not None and not (m.opt.disableflags & M.DSBL_CONTACT):
        qfrc_constraint = qfrc_constraint + contact_fn(
            m, data, qM_chol, qacc_smooth + jax.scipy.linalg.cho_solve(
                qM_chol, qfrc_constraint), qvel)

    qacc = qacc_smooth + jax.scipy.linalg.cho_solve(qM_chol, qfrc_constraint)
    return data.replace(qfrc_constraint=qfrc_constraint, qacc=qacc)


# --------------------------------------------------------------------------
# Integration
# --------------------------------------------------------------------------

def integrate_pos(m: M.Model, qpos: jnp.ndarray, qvel: jnp.ndarray,
                  dt) -> jnp.ndarray:
    """qpos += dt * qvel with quaternion handling per joint type."""
    out = qpos
    for j in range(m.njnt):
        jtype = m.jnt_type[j]
        qadr, dadr = m.jnt_qposadr[j], m.jnt_dofadr[j]
        if jtype in (M.SLIDE, M.HINGE):
            out = out.at[qadr].add(dt * qvel[dadr])
        elif jtype == M.BALL:
            q = pm.quat_integrate(qpos[qadr:qadr + 4],
                                  qvel[dadr:dadr + 3], dt)
            out = out.at[qadr:qadr + 4].set(q)
        elif jtype == M.FREE:
            out = out.at[qadr:qadr + 3].add(dt * qvel[dadr:dadr + 3])
            q = pm.quat_integrate(qpos[qadr + 3:qadr + 7],
                                  qvel[dadr + 3:dadr + 6], dt)
            out = out.at[qadr + 3:qadr + 7].set(q)
    return out


def _euler(m: M.Model, state: M.State, ctrl, contact_fn) -> M.State:
    h = m.opt.timestep.astype(state.qpos.dtype)
    d = forward(m, state, ctrl, contact_fn)
    # Implicit damping: v' = v + h*(M + h*B)^-1 * f_explicit  (mj_Euler).
    f_total = (d.qfrc_passive + d.qfrc_actuator - d.qfrc_bias
               + d.qfrc_constraint)
    MhB = d.qM + h * jnp.diag(m.dof_damping)
    qacc = jax.scipy.linalg.cho_solve(
        jax.scipy.linalg.cho_factor(MhB), f_total)
    qvel = state.qvel + h * qacc
    qpos = integrate_pos(m, state.qpos, qvel, h)
    return M.State(qpos=qpos, qvel=qvel, time=state.time + h)


_RK4_A = ((0.5,), (0.0, 0.5), (0.0, 0.0, 1.0))
_RK4_B = (1.0 / 6.0, 1.0 / 3.0, 1.0 / 3.0, 1.0 / 6.0)


def _rk4(m: M.Model, state: M.State, ctrl, contact_fn) -> M.State:
    h = m.opt.timestep.astype(state.qpos.dtype)
    q0, v0 = state.qpos, state.qvel

    vels = [v0]
    accs = [forward(m, state, ctrl, contact_fn).qacc]
    for i, arow in enumerate(_RK4_A):
        dv = sum(a * acc for a, acc in zip(arow, accs) if a != 0.0)
        dq_vel = sum(a * vel for a, vel in zip(arow, vels) if a != 0.0)
        qi = integrate_pos(m, q0, dq_vel, h)
        vi = v0 + h * dv
        di = forward(m, M.State(qpos=qi, qvel=vi, time=state.time), ctrl,
                     contact_fn)
        vels.append(vi)
        accs.append(di.qacc)

    vel_w = sum(bw * vel for bw, vel in zip(_RK4_B, vels))
    acc_w = sum(bw * acc for bw, acc in zip(_RK4_B, accs))
    qpos = integrate_pos(m, q0, vel_w, h)
    qvel = v0 + h * acc_w
    return M.State(qpos=qpos, qvel=qvel, time=state.time + h)


def step(m: M.Model, state: M.State, ctrl: jnp.ndarray,
         contact_fn=None) -> M.State:
    """Advance physics by one timestep (pure; jit/vmap/scan-safe)."""
    if m.opt.integrator == M.RK4:
        return _rk4(m, state, ctrl, contact_fn)
    return _euler(m, state, ctrl, contact_fn)


def n_substeps(m: M.Model, control_timestep: float) -> int:
    """Number of physics substeps per control step (rl/control.py:171-197)."""
    ts = float(m.opt.timestep)
    n = int(round(control_timestep / ts))
    if abs(n * ts - control_timestep) > 1e-6:
        raise ValueError(
            f'control_timestep {control_timestep} not an integer multiple '
            f'of physics timestep {ts}')
    return n


def substep(m: M.Model, state: M.State, ctrl: jnp.ndarray, n: int,
            contact_fn=None) -> M.State:
    """n physics steps under constant ctrl, as a lax.scan."""
    if n == 1:
        return step(m, state, ctrl, contact_fn)

    def body(s, _):
        return step(m, s, ctrl, contact_fn), None

    out, _ = jax.lax.scan(body, state, None, length=n)
    return out
