"""Smooth (unconstrained) articulated-body dynamics in world-frame spatial algebra.

Replaces the smooth-dynamics half of libmujoco.so's ``mj_step`` pipeline
(reached by the reference through ctypes at
``dm_control/dm_control/mujoco/engine.py:133-150``):

  kinematics -> composite-rigid-body mass matrix -> recursive-Newton-Euler
  bias forces -> passive spring/damper -> actuation.

Design notes (TPU-first):
  * The kinematic tree is static per compiled model, so every loop below is a
    Python loop over at most ~15 bodies that unrolls at trace time into a
    fixed XLA graph of small fused ops. Batching over thousands of envs is
    done with `vmap` one level up, which turns each small op into a wide
    (batch, ...) op that tiles cleanly onto the VPU/MXU.
  * All spatial quantities (motion/force 6-vectors, spatial inertias) are
    expressed in the world frame about the world origin — no per-body frame
    transforms inside the inner loops, fewer transposes for XLA to fuse.
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from . import math as pm
from . import model as M


class TreeMeta(NamedTuple):
    """Static tree addressing derived from the model (trace-time only)."""
    body_joints: Tuple[Tuple[int, ...], ...]   # joints per body, in order
    body_dofs: Tuple[Tuple[int, ...], ...]     # dofs per body, in order
    ancestor_dofs: Tuple[Tuple[int, ...], ...]  # dofs on root->body chain
    body_order: Tuple[int, ...]                # topological (== index order)


def tree_meta(m: M.Model) -> TreeMeta:
    body_joints: List[List[int]] = [[] for _ in range(m.nbody)]
    for j in range(m.njnt):
        body_joints[m.jnt_body[j]].append(j)
    body_dofs: List[List[int]] = [[] for _ in range(m.nbody)]
    for b in range(m.nbody):
        for j in body_joints[b]:
            adr = m.jnt_dofadr[j]
            for k in range(_dof_width(m.jnt_type[j])):
                body_dofs[b].append(adr + k)
    ancestor_dofs: List[List[int]] = [[] for _ in range(m.nbody)]
    for b in range(1, m.nbody):
        ancestor_dofs[b] = list(ancestor_dofs[m.body_parent[b]]) + body_dofs[b]
    return TreeMeta(
        body_joints=tuple(tuple(x) for x in body_joints),
        body_dofs=tuple(tuple(x) for x in body_dofs),
        ancestor_dofs=tuple(tuple(x) for x in ancestor_dofs),
        body_order=tuple(range(m.nbody)),
    )


def _dof_width(jtype: int) -> int:
    return {M.FREE: 6, M.BALL: 3, M.SLIDE: 1, M.HINGE: 1}[jtype]


def _qpos_width(jtype: int) -> int:
    return {M.FREE: 7, M.BALL: 4, M.SLIDE: 1, M.HINGE: 1}[jtype]


# --------------------------------------------------------------------------
# Forward kinematics
# --------------------------------------------------------------------------

def kinematics(m: M.Model, qpos: jnp.ndarray, meta: TreeMeta):
    """Body/geom/site poses and world joint anchors/axes.

    Follows libmujoco's mj_kinematics semantics: joints are applied in
    declaration order within a body, displacing relative to the reference
    configuration qpos0.

    Per-joint local rotations and all geom/site/body-matrix math are
    vectorized over joints/geoms; only the (inherently sequential) parent
    chain accumulation is an unrolled loop. This keeps the HLO graph small
    enough for the compiler to fuse even for deep 3D models — a naive
    fully-unrolled version exceeded XLA:CPU's fusion limits on the humanoid
    (tens of thousands of scalar thunks, ~4s/step).
    """
    import numpy as np
    dtype = qpos.dtype

    # ---- vectorized local rotations for all hinge joints -----------------
    hinges = [j for j in range(m.njnt) if m.jnt_type[j] == M.HINGE]
    hq = None
    hq_index = {}
    if hinges:
        h_adr = np.array([m.jnt_qposadr[j] for j in hinges])
        h_axes = m.jnt_axis[np.array(hinges)]
        angles = qpos[h_adr] - m.qpos0[h_adr]
        half = 0.5 * angles
        hq = jnp.concatenate([jnp.cos(half)[:, None],
                              h_axes * jnp.sin(half)[:, None]], axis=1)
        hq_index = {j: i for i, j in enumerate(hinges)}

    # static fast-path predicates — only when the arrays are concrete at
    # trace time. Tasks override body_pos/body_quat per episode (moved
    # targets), making them tracers; then every body takes the general
    # path.
    def _concrete(x):
        try:
            return np.asarray(x)
        except Exception:
            return None

    body_pos_np = _concrete(m.body_pos)
    body_quat_np = _concrete(m.body_quat)
    jnt_pos_np = _concrete(m.jnt_pos)

    xpos = [jnp.zeros(3, dtype)]
    xquat = [jnp.array([1.0, 0, 0, 0], dtype)]
    xanchor = [None] * m.njnt
    xaxis = [None] * m.njnt

    for b in range(1, m.nbody):
        p = m.body_parent[b]
        joints = meta.body_joints[b]
        if joints and m.jnt_type[joints[0]] == M.FREE:
            j = joints[0]
            adr = m.jnt_qposadr[j]
            pos = qpos[adr:adr + 3]
            quat = pm.quat_normalize(qpos[adr + 3:adr + 7])
            xanchor[j] = pos
            xaxis[j] = pm.quat_rot(quat, m.jnt_axis[j])
            xpos.append(pos)
            xquat.append(quat)
            continue

        identity_bq = (body_quat_np is not None
                       and np.allclose(body_quat_np[b], [1, 0, 0, 0]))
        quat = (xquat[p] if identity_bq
                else pm.quat_mul(xquat[p], m.body_quat[b]))
        if body_pos_np is not None and np.allclose(body_pos_np[b], 0):
            pos = xpos[p]
        else:
            pos = xpos[p] + pm.quat_rot(xquat[p], m.body_pos[b])

        for j in joints:
            adr = m.jnt_qposadr[j]
            jtype = m.jnt_type[j]
            zero_anchor = (jnt_pos_np is not None
                           and np.allclose(jnt_pos_np[j], 0))
            if jtype == M.SLIDE:
                axis_w = pm.quat_rot(quat, m.jnt_axis[j])
                pos = pos + axis_w * (qpos[adr] - m.qpos0[adr])
                anchor = (pos if zero_anchor
                          else pos + pm.quat_rot(quat, m.jnt_pos[j]))
                xaxis[j] = axis_w
            elif jtype in (M.HINGE, M.BALL):
                qloc = (hq[hq_index[j]] if jtype == M.HINGE
                        else pm.quat_normalize(qpos[adr:adr + 4]))
                if zero_anchor:
                    anchor = pos
                    quat = pm.quat_mul(quat, qloc)
                else:
                    anchor = pos + pm.quat_rot(quat, m.jnt_pos[j])
                    quat = pm.quat_mul(quat, qloc)
                    pos = anchor - pm.quat_rot(quat, m.jnt_pos[j])
                xaxis[j] = pm.quat_rot(quat, m.jnt_axis[j])
            xanchor[j] = anchor
        xpos.append(pos)
        xquat.append(quat)

    xpos = jnp.stack(xpos)
    xquat = jnp.stack(xquat)
    xmat = jax.vmap(pm.quat_to_mat)(xquat)

    # ---- geoms / sites: fully vectorized ---------------------------------
    if m.ngeom:
        gb = np.array(m.geom_body)
        geom_xpos = xpos[gb] + jax.vmap(pm.quat_rot)(xquat[gb], m.geom_pos)
        gq = jax.vmap(pm.quat_mul)(xquat[gb], m.geom_quat)
        geom_xmat = jax.vmap(pm.quat_to_mat)(gq)
    else:
        geom_xpos = jnp.zeros((0, 3), dtype)
        geom_xmat = jnp.zeros((0, 3, 3), dtype)
    if m.nsite:
        sb = np.array(m.site_body)
        site_xpos = xpos[sb] + jax.vmap(pm.quat_rot)(xquat[sb], m.site_pos)
    else:
        site_xpos = jnp.zeros((0, 3), dtype)

    xanchor = (jnp.stack(xanchor) if m.njnt
               else jnp.zeros((0, 3), dtype))
    xaxis = (jnp.stack(xaxis) if m.njnt
             else jnp.zeros((0, 3), dtype))
    return xpos, xquat, xmat, geom_xpos, geom_xmat, site_xpos, xanchor, xaxis


def com_positions(m: M.Model, xpos, xquat):
    """World CoM of each body (xipos), vectorized over bodies."""
    return xpos + jax.vmap(pm.quat_rot)(xquat, m.body_ipos)


def motion_subspace(m: M.Model, xquat, xanchor, xaxis, meta: TreeMeta):
    """cdof: per-dof spatial motion vectors (world frame, about origin)."""
    dtype = xquat.dtype
    cdof = [None] * m.nv
    for j in range(m.njnt):
        jtype = m.jnt_type[j]
        adr = m.jnt_dofadr[j]
        if jtype == M.FREE:
            zero = jnp.zeros(3, dtype)
            eye = jnp.eye(3, dtype=dtype)
            for k in range(3):  # translations along world axes
                cdof[adr + k] = jnp.concatenate([zero, eye[k]])
            R = pm.quat_to_mat(xquat[m.jnt_body[j]])
            anchor = xanchor[j]
            for k in range(3):  # rotations about body-local axes
                ax = R[:, k]
                cdof[adr + 3 + k] = jnp.concatenate(
                    [ax, jnp.cross(anchor, ax)])
        elif jtype == M.BALL:
            R = pm.quat_to_mat(xquat[m.jnt_body[j]])
            anchor = xanchor[j]
            for k in range(3):
                ax = R[:, k]
                cdof[adr + k] = jnp.concatenate([ax, jnp.cross(anchor, ax)])
        elif jtype == M.SLIDE:
            cdof[adr] = jnp.concatenate([jnp.zeros(3, dtype), xaxis[j]])
        elif jtype == M.HINGE:
            ax = xaxis[j]
            cdof[adr] = jnp.concatenate([ax, jnp.cross(xanchor[j], ax)])
    return (jnp.stack(cdof) if m.nv else jnp.zeros((0, 6), dtype))


def body_spatial_inertia(m: M.Model, xquat, xipos):
    """Per-body 6x6 spatial inertia about world origin (cinert), batched."""
    R = jax.vmap(pm.quat_to_mat)(xquat)                       # (nb,3,3)
    I_world = jnp.einsum('bij,bjk,blk->bil', R, m.body_inertia, R)
    return jax.vmap(pm.spatial_inertia)(m.body_mass, I_world, xipos)


# --------------------------------------------------------------------------
# CRBA mass matrix
# --------------------------------------------------------------------------

def crba(m: M.Model, cdof, cinert, meta: TreeMeta) -> jnp.ndarray:
    """Joint-space inertia matrix via Composite Rigid Body Algorithm.

    M[i, j] = cdof[j] . (crb[body(i)] @ cdof[i]) for j on i's ancestor
    chain. Computed as ONE (nv, 6)x(6, nv) matmul masked by a static
    ancestor matrix — MXU-shaped, instead of O(nv * chain) scalar
    scatter updates (which dominated compile time on 3D models).
    """
    import numpy as np
    dtype = cdof.dtype
    if not m.nv:
        return jnp.zeros((0, 0), dtype)
    # subtree composite inertias (sequential over ~nbody, cheap)
    crb = [cinert[b] for b in range(m.nbody)]
    for b in range(m.nbody - 1, 0, -1):
        p = m.body_parent[b]
        crb[p] = crb[p] + crb[b]
    crb = jnp.stack(crb)                                    # (nbody, 6, 6)

    dof_body = np.zeros(m.nv, np.int64)
    for b in range(m.nbody):
        for k in meta.body_dofs[b]:
            dof_body[k] = b
    # static mask: lower[i, j] = 1 iff j <= i and j on chain(body(i))
    lower = np.zeros((m.nv, m.nv), np.float32)
    for b in range(1, m.nbody):
        chain = meta.ancestor_dofs[b]
        for i in meta.body_dofs[b]:
            for j in chain:
                if j <= i:
                    lower[i, j] = 1.0

    F = jnp.einsum('kij,kj->ki', crb[dof_body], cdof)       # (nv, 6)
    Mfull = F @ cdof.T                                      # (nv, nv)
    Mlow = Mfull * jnp.asarray(lower, dtype)
    Mmat = Mlow + jnp.tril(Mlow, -1).T
    return Mmat + jnp.diag(m.dof_armature)


# --------------------------------------------------------------------------
# Velocities + RNEA bias forces
# --------------------------------------------------------------------------

def velocities(m: M.Model, qvel, cdof, meta: TreeMeta):
    """Body spatial velocities cvel and per-dof cdof_dot (world frame).

    Matches mj_comVel's per-joint-type ordering exactly (reference
    semantics: engine_core_smooth.c): for BALL and FREE-rotation dof
    triples, all three cdof_dot vectors are computed with the body
    velocity BEFORE that joint's rotational contributions are added
    (free-joint translations ARE added first); hinge/slide use the
    velocity before their own dof. Free translations have cdof_dot = 0.
    Getting this wrong leaves O(1) errors in qfrc_bias on every free- or
    ball-jointed model as soon as the root rotates.
    """
    dtype = qvel.dtype
    cvel = [jnp.zeros(6, dtype)]
    cdof_dot = [None] * m.nv
    for b in range(1, m.nbody):
        v = cvel[m.body_parent[b]]
        for j in meta.body_joints[b]:
            jtype = m.jnt_type[j]
            adr = m.jnt_dofadr[j]
            if jtype == M.FREE:
                for k in range(3):
                    cdof_dot[adr + k] = jnp.zeros(6, dtype)
                    v = v + cdof[adr + k] * qvel[adr + k]
                rot = range(adr + 3, adr + 6)
            elif jtype == M.BALL:
                rot = range(adr, adr + 3)
            else:
                cdof_dot[adr] = pm.motion_cross(v, cdof[adr])
                v = v + cdof[adr] * qvel[adr]
                continue
            for k in rot:
                cdof_dot[k] = pm.motion_cross(v, cdof[k])
            for k in rot:
                v = v + cdof[k] * qvel[k]
        cvel.append(v)
    cvel = jnp.stack(cvel)
    cdof_dot = (jnp.stack(cdof_dot) if m.nv
                else jnp.zeros((0, 6), dtype))
    return cvel, cdof_dot


def rnea_bias(m: M.Model, qvel, cdof, cdof_dot, cvel, cinert,
              meta: TreeMeta, gravity_on: bool) -> jnp.ndarray:
    """qfrc_bias: Coriolis/centrifugal + gravity via recursive Newton-Euler."""
    dtype = qvel.dtype
    g = m.opt.gravity if gravity_on else jnp.zeros(3, dtype)
    a0 = jnp.concatenate([jnp.zeros(3, dtype), -g])  # gravity trick

    a_bias = [a0]
    for b in range(1, m.nbody):
        a = a_bias[m.body_parent[b]]
        for k in meta.body_dofs[b]:
            a = a + cdof_dot[k] * qvel[k]
        a_bias.append(a)

    import numpy as np
    a_stack = jnp.stack(a_bias)                              # (nbody, 6)
    Iv = jnp.einsum('bij,bj->bi', cinert, cvel)
    f_stack = (jnp.einsum('bij,bj->bi', cinert, a_stack)
               + jax.vmap(pm.force_cross)(cvel, Iv))
    # accumulate up the tree (sequential over ~nbody, cheap)
    f = [f_stack[b] for b in range(m.nbody)]
    for b in range(m.nbody - 1, 0, -1):
        p = m.body_parent[b]
        f[p] = f[p] + f[b]
    f = jnp.stack(f)

    dof_body = np.zeros(m.nv, np.int64)
    for b in range(m.nbody):
        for k in meta.body_dofs[b]:
            dof_body[k] = b
    return jnp.einsum('kj,kj->k', cdof, f[dof_body])


# --------------------------------------------------------------------------
# Passive forces (springs; damping handled separately for implicit Euler)
# --------------------------------------------------------------------------

def spring_force(m: M.Model, qpos: jnp.ndarray) -> jnp.ndarray:
    """qfrc from joint springs: -stiffness * (qpos - qpos_spring)."""
    import numpy as np
    dtype = qpos.dtype
    qfrc = jnp.zeros(m.nv, dtype)
    # scalar joints, one batched scatter
    sq, sd, sj = [], [], []
    for j in range(m.njnt):
        if m.jnt_type[j] in (M.SLIDE, M.HINGE):
            sq.append(m.jnt_qposadr[j])
            sd.append(m.jnt_dofadr[j])
            sj.append(j)
    if sq:
        sq, sd, sj = np.array(sq), np.array(sd), np.array(sj)
        qfrc = qfrc.at[sd].add(
            -m.jnt_stiffness[sj] * (qpos[sq] - m.qpos_spring[sq]))
    for j in range(m.njnt):
        if m.jnt_type[j] == M.FREE:
            qadr, dadr = m.jnt_qposadr[j], m.jnt_dofadr[j]
            qfrc = qfrc.at[dadr:dadr + 3].add(
                -m.jnt_stiffness[j] * (qpos[qadr:qadr + 3]
                                       - m.qpos_spring[qadr:qadr + 3]))
            # rotational spring on free joints unused by the task suite
    return qfrc


def damping_force(m: M.Model, qvel: jnp.ndarray) -> jnp.ndarray:
    return -m.dof_damping * qvel


def fixed_tendon_length(m: M.Model, qpos: jnp.ndarray,
                        t: int) -> jnp.ndarray:
    """Length of fixed tendon t: sum(coef * qpos[jnt]) over scalar joints."""
    length = jnp.zeros((), qpos.dtype)
    for ji, coef in m.tendon_jnt[t]:
        length = length + coef * qpos[m.jnt_qposadr[ji]]
    return length


def tendon_passive_force(m: M.Model, qpos, qvel) -> jnp.ndarray:
    """Fixed-tendon spring/damper forces (fish fins_sym)."""
    qfrc = jnp.zeros(m.nv, qpos.dtype)
    import numpy as np
    stiff_np = np.asarray(m.tendon_stiffness)
    damp_np = np.asarray(m.tendon_damping)
    for t in range(m.ntendon):
        if float(stiff_np[t]) == 0.0 and float(damp_np[t]) == 0.0:
            continue
        length = fixed_tendon_length(m, qpos, t)
        vel = m.tendon_moment[t] @ qvel
        force = -m.tendon_stiffness[t] * length - m.tendon_damping[t] * vel
        qfrc = qfrc + m.tendon_moment[t] * force
    return qfrc


def fluid_force(m: M.Model, xipos, xquat, cvel, cdof,
                meta: TreeMeta) -> jnp.ndarray:
    """Viscous + density fluid forces (MuJoCo inertia-box model).

    Per body, in the principal inertia frame with equivalent box half
    sizes (b0,b1,b2):
      viscosity eta: f = -3*pi*eta*d*v,  tau = -pi*eta*d^3*w,
                     d = 2*(b0+b1+b2)/3
      density rho:   f_i = -2*rho*b_j*b_k*|v_i|*v_i
                     tau_i = -rho*b_i*(b_j^4 + b_k^4)*|w_i|*w_i / 2
    Needed by the swimmer/fish domains (option density/viscosity).
    """
    import numpy as np
    dtype = cvel.dtype
    rho = m.opt.density
    eta = m.opt.viscosity
    # static mask for massless bodies (world, ghost frames)
    live = jnp.asarray(
        (np.asarray(m.body_mass) > 1e-12).astype(np.float32), dtype)

    # all bodies at once: velocities in each body's principal frame
    R_body = jax.vmap(pm.quat_to_mat)(xquat)                   # (nb, 3, 3)
    R = jnp.einsum('bij,bjk->bik', R_body, m.body_principal_mat)
    com = xipos
    w_world = cvel[:, :3]
    v_world = cvel[:, 3:] + jnp.cross(w_world, com) - m.opt.wind
    v = jnp.einsum('bji,bj->bi', R, v_world)                   # R^T v
    w = jnp.einsum('bji,bj->bi', R, w_world)
    box = m.body_fluid_box                                      # (nb, 3)
    d_eq = 2.0 * box.sum(axis=1, keepdims=True) / 3.0

    f_loc = -3.0 * jnp.pi * eta * d_eq * v
    t_loc = -jnp.pi * eta * d_eq ** 3 * w
    b0, b1, b2 = box[:, 0], box[:, 1], box[:, 2]
    areas = jnp.stack([b1 * b2, b0 * b2, b0 * b1], axis=1)
    f_loc = f_loc - 2.0 * rho * areas * jnp.abs(v) * v
    moments = jnp.stack([b0 * (b1 ** 4 + b2 ** 4),
                         b1 * (b0 ** 4 + b2 ** 4),
                         b2 * (b0 ** 4 + b1 ** 4)], axis=1)
    t_loc = t_loc - 0.5 * rho * moments * jnp.abs(w) * w

    f_world = jnp.einsum('bij,bj->bi', R, f_loc)
    t_world = jnp.einsum('bij,bj->bi', R, t_loc)
    # spatial force about world origin, masked to massive bodies
    f_spatial = live[:, None] * jnp.concatenate(
        [t_world + jnp.cross(com, f_world), f_world], axis=1)   # (nb, 6)

    # accumulate subtree forces and project onto dofs (J^T f)
    f_acc = [f_spatial[b] for b in range(m.nbody)]
    for b in range(m.nbody - 1, 0, -1):
        p = m.body_parent[b]
        f_acc[p] = f_acc[p] + f_acc[b]
    f_acc = jnp.stack(f_acc)
    dof_body = np.zeros(m.nv, np.int64)
    for b in range(m.nbody):
        for k in meta.body_dofs[b]:
            dof_body[k] = b
    return jnp.einsum('kj,kj->k', cdof, f_acc[dof_body])


# --------------------------------------------------------------------------
# Actuation
# --------------------------------------------------------------------------

def actuation(m: M.Model, qpos, qvel, ctrl, act=None
              ) -> Tuple[jnp.ndarray, jnp.ndarray, 'jnp.ndarray']:
    """(actuator_force, qfrc_actuator, act_dot) — mj_fwdActuation semantics.

    Joint-transmission actuators (the entire suite except the fish's
    tendon-driven fins) evaluate as one batched expression over all
    actuators; only tendon transmissions loop. Stateful actuators
    (dyntype filter/integrator, e.g. the quadruped's) drive the gain from
    their activation state and return its time derivative for the
    integrator (act_dot is None for models with na == 0).
    """
    import numpy as np
    dtype = qpos.dtype
    if m.nu == 0 or (m.opt.disableflags & M.DSBL_ACTUATION):
        return (jnp.zeros((m.nu,), dtype), jnp.zeros((m.nv,), dtype),
                None)

    # per-actuator transmission length/velocity
    length = jnp.zeros((m.nu,), dtype)
    velocity = jnp.zeros((m.nu,), dtype)
    joint_us = [u for u in range(m.nu)
                if m.actuator_trntype[u] == M.TRN_JOINT]
    if joint_us:
        uj = np.array(joint_us)
        jids = np.array([m.actuator_trnid[u] for u in joint_us])
        qadr = np.array([m.jnt_qposadr[j] for j in jids])
        dadr = np.array([m.jnt_dofadr[j] for j in jids])
        gear_j = m.actuator_gear[uj]
        length = length.at[uj].set(gear_j * qpos[qadr])
        velocity = velocity.at[uj].set(gear_j * qvel[dadr])
    tendon_us = [u for u in range(m.nu)
                 if m.actuator_trntype[u] != M.TRN_JOINT]
    for u in tendon_us:
        t = m.actuator_trnid[u]
        gear = m.actuator_gear[u]
        length = length.at[u].set(gear * fixed_tendon_length(m, qpos, t))
        velocity = velocity.at[u].set(gear * (m.tendon_moment[t] @ qvel))

    # batched ctrl clamping, gain, affine bias, force clamping
    ctrl_lim = np.array(m.actuator_ctrllimited)
    c = jnp.where(jnp.asarray(ctrl_lim),
                  jnp.clip(ctrl, m.actuator_ctrlrange[:, 0],
                           m.actuator_ctrlrange[:, 1]), ctrl)

    # activation dynamics: gain input = act for stateful actuators
    act_dot = None
    gain_in = c
    if m.na and act is not None:
        dyn = np.array(m.actuator_dyntype)
        adr = np.array(m.actuator_actadr)
        stateful = dyn != M.DYN_NONE
        gain_in = jnp.where(jnp.asarray(stateful),
                            act[np.where(stateful, adr, 0)], c)
        slot_u = np.nonzero(stateful)[0]        # actuator of each act slot
        tau = jnp.maximum(m.actuator_dynprm[slot_u, 0], 1e-8)
        is_filter = np.array([m.actuator_dyntype[u] == M.DYN_FILTER
                              for u in slot_u])
        act_dot = jnp.where(jnp.asarray(is_filter),
                            (c[slot_u] - act) / tau, c[slot_u])

    force = m.actuator_gainprm[:, 0] * gain_in
    affine = np.array([bt == M.BIAS_AFFINE for bt in m.actuator_biastype])
    if affine.any():
        force = force + jnp.asarray(affine, dtype) * (
            m.actuator_biasprm[:, 0]
            + m.actuator_biasprm[:, 1] * length
            + m.actuator_biasprm[:, 2] * velocity)
    force_lim = np.array(m.actuator_forcelimited)
    if force_lim.any():
        force = jnp.where(jnp.asarray(force_lim),
                          jnp.clip(force, m.actuator_forcerange[:, 0],
                                   m.actuator_forcerange[:, 1]), force)

    # project to dofs: joint transmissions in one scatter-add
    qfrc = jnp.zeros(m.nv, dtype)
    if joint_us:
        qfrc = qfrc.at[dadr].add(gear_j * force[uj])
    for u in tendon_us:
        t = m.actuator_trnid[u]
        qfrc = qfrc + m.tendon_moment[t] * (m.actuator_gear[u] * force[u])

    return force, qfrc, act_dot
