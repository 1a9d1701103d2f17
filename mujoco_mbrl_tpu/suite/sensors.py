"""Sensor equivalents needed by the task suite.

The reference reads mjData.sensordata filled by libmujoco's sensor pipeline
(subtreelinvel for cheetah/walker/hopper speed, touch for hopper feet).
Here each sensor is a pure function over (Model, Data).
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp

from ..physics import collision
from ..physics import model as M
from ..physics import smooth


def subtree_bodies(m: M.Model, root: int) -> Tuple[int, ...]:
    """Static: all bodies in the kinematic subtree rooted at `root`."""
    out = []
    for b in range(root, m.nbody):
        p = b
        while p >= root:
            if p == root:
                out.append(b)
                break
            p = m.body_parent[p]
    return tuple(out)


def subtree_linvel(m: M.Model, data: M.Data, root: int) -> jnp.ndarray:
    """Linear velocity of the subtree center of mass (subtreelinvel sensor).

    v = (sum_b m_b * v_b(com_b)) / sum_b m_b, with body CoM velocity from
    the world-frame spatial velocity: v(com) = lin + ang x com.
    """
    bodies = subtree_bodies(m, root)
    total_p = jnp.zeros(3, data.cvel.dtype)
    total_m = 0.0
    for b in bodies:
        v = data.cvel[b, 3:] + jnp.cross(data.cvel[b, :3], data.xipos[b])
        total_p = total_p + m.body_mass[b] * v
        total_m = total_m + m.body_mass[b]
    return total_p / jnp.maximum(total_m, 1e-12)


def subtree_com(m: M.Model, data: M.Data, root: int) -> jnp.ndarray:
    """Center of mass of the kinematic subtree (mjData.subtree_com)."""
    bodies = subtree_bodies(m, root)
    total_p = jnp.zeros(3, data.xipos.dtype)
    total_m = 0.0
    for b in bodies:
        total_p = total_p + m.body_mass[b] * data.xipos[b]
        total_m = total_m + m.body_mass[b]
    return total_p / jnp.maximum(total_m, 1e-12)


def contact_layout(m: M.Model) -> List[Tuple[int, int]]:
    """Static per-contact (geom1, geom2) list matching collision.detect's
    emission order for this model's candidate pairs."""
    pairs = collision.candidate_pairs(
        m, include_geom_geom=m.opt.enable_geom_geom_contacts)
    layout = []
    for g1, g2 in pairs:
        t1, t2 = m.geom_type[g1], m.geom_type[g2]
        n = collision._PAIR_POINTS[(t1, t2)]
        layout.extend([(g1, g2)] * n)
    return layout


def touch(m: M.Model, data: M.Data, site_id: int,
          geom_id: int = None, radius: float = None) -> jnp.ndarray:
    """Touch sensor with MuJoCo's exact semantics (mjSENS_TOUCH): sum of
    normal-force magnitudes over every contact that (a) involves a geom
    on the site's BODY and (b) whose contact point lies inside the site's
    actual volume (sphere/capsule/ellipsoid/box with the site's size and
    pose). `geom_id`/`radius` are accepted for backward compatibility and
    ignored — the body + site-zone test is the real contract.
    """
    from ..physics import math as pm
    layout = contact_layout(m)
    body = m.site_body[site_id]
    stype = m.site_type[site_id] if m.site_type else M.SPHERE
    size = (m.site_size[site_id] if m.site_size is not None
            else jnp.full(3, 0.005))
    R_site = data.ximat[body] @ pm.quat_to_mat(m.site_quat[site_id])
    total = jnp.zeros((), data.contact_force.dtype)
    for c, (g1, g2) in enumerate(layout):
        if m.geom_body[g1] != body and m.geom_body[g2] != body:
            continue
        p = (data.contact_pos[c] - data.site_xpos[site_id]) @ R_site
        if stype == M.SPHERE:
            inside = jnp.sum((p / size[0]) ** 2) <= 1.0
        elif stype == M.CAPSULE:
            z = jnp.clip(p[2], -size[1], size[1])
            inside = (p[0] ** 2 + p[1] ** 2
                      + (p[2] - z) ** 2) <= size[0] ** 2
        elif stype == M.ELLIPSOID:
            inside = jnp.sum((p / size) ** 2) <= 1.0
        else:  # BOX / CYLINDER -> box test (MuJoCo supports box zones)
            inside = jnp.all(jnp.abs(p) <= size)
        active = (data.contact_dist[c] < 0)
        total = total + (inside & active).astype(total.dtype) * \
            jnp.maximum(data.contact_force[c, 0], 0.0)
    return total


# ---------------------------------------------------------------------------
# Site-frame IMU-style sensors (quadruped domain: gyro / accelerometer /
# velocimeter / force / torque, reference suite/quadruped.xml sensor block)
# ---------------------------------------------------------------------------

def site_xmat(m: M.Model, data: M.Data, site_id: int) -> jnp.ndarray:
    """World rotation of a site frame: body rotation x site offset."""
    from ..physics import math as pm
    return data.ximat[m.site_body[site_id]] @ pm.quat_to_mat(
        m.site_quat[site_id])


def gyro(m: M.Model, data: M.Data, site_id: int) -> jnp.ndarray:
    """Angular velocity of the site's body, in the site frame."""
    w = data.cvel[m.site_body[site_id], :3]
    return site_xmat(m, data, site_id).T @ w


def velocimeter(m: M.Model, data: M.Data, site_id: int) -> jnp.ndarray:
    """Linear velocity of the site point, in the site frame."""
    b = m.site_body[site_id]
    v6 = data.cvel[b]                    # world spatial velocity @ origin
    p = data.site_xpos[site_id]
    v = v6[3:] + jnp.cross(v6[:3], p)
    return site_xmat(m, data, site_id).T @ v


def body_cacc(m: M.Model, data: M.Data, qvel: jnp.ndarray) -> jnp.ndarray:
    """Spatial accelerations of all bodies (world frame, about origin).

    cacc[b] = cacc[parent] + sum_k cdof[k]*qacc[k] + cdof_dot[k]*qvel[k],
    seeded with -gravity at the root (the RNEA gravity trick) so a body at
    rest reads +|g| on a z-up accelerometer, matching mjSENS_ACCELEROMETER.
    """
    meta = smooth.tree_meta(m)
    dtype = data.cvel.dtype
    a0 = jnp.concatenate([jnp.zeros(3, dtype),
                          -m.opt.gravity.astype(dtype)])
    acc = [a0]
    for b in range(1, m.nbody):
        a = acc[m.body_parent[b]]
        for k in meta.body_dofs[b]:
            a = (a + data.cdof[k] * data.qacc[k]
                 + data.cdof_dot[k] * qvel[k])
        acc.append(a)
    return jnp.stack(acc)


def accelerometer(m: M.Model, data: M.Data, qvel: jnp.ndarray,
                  site_id: int) -> jnp.ndarray:
    """Proper linear acceleration of the site point, in the site frame.

    Classical point acceleration from the spatial acceleration A about the
    origin: a(p) = A_lin + A_ang x p + w x v(p).
    """
    b = m.site_body[site_id]
    A = body_cacc(m, data, qvel)[b]
    v6 = data.cvel[b]
    p = data.site_xpos[site_id]
    v_p = v6[3:] + jnp.cross(v6[:3], p)
    a_p = A[3:] + jnp.cross(A[:3], p) + jnp.cross(v6[:3], v_p)
    return site_xmat(m, data, site_id).T @ a_p


def contact_force_on_body(m: M.Model, data: M.Data,
                          body: int) -> jnp.ndarray:
    """Net world-frame contact force acting on `body`'s geoms.

    Uses the solver's per-contact (normal, t1, t2) forces; the normal
    points g1 -> g2, so force on body(g2) is +frame^T f and on body(g1)
    is -frame^T f.
    """
    pairs = contact_layout(m)
    f = jnp.zeros(3, data.contact_force.dtype)
    for c, (g1, g2) in enumerate(pairs):
        fw = data.contact_force[c] @ data.contact_frame[c]
        if m.geom_body[g2] == body:
            f = f + fw
        if m.geom_body[g1] == body:
            f = f - fw
    return f


def force_site(m: M.Model, data: M.Data, site_id: int) -> jnp.ndarray:
    """Ground-reaction force on the site's body, in the site frame.

    Approximates mjSENS_FORCE (parent-interaction force) by the net
    contact force on the body — for the quadruped's toe sensors the toe
    mass is negligible relative to ground reaction, which is the signal
    the Fetch/Move observations use (arcsinh-scaled).
    """
    b = m.site_body[site_id]
    f = contact_force_on_body(m, data, b)
    return site_xmat(m, data, site_id).T @ f


def torque_site(m: M.Model, data: M.Data, site_id: int) -> jnp.ndarray:
    """Contact torque about the site point, in the site frame (same
    approximation as force_site)."""
    pairs = contact_layout(m)
    b = m.site_body[site_id]
    p0 = data.site_xpos[site_id]
    tau = jnp.zeros(3, data.contact_force.dtype)
    for c, (g1, g2) in enumerate(pairs):
        sign = 0.0
        if m.geom_body[g2] == b:
            sign = 1.0
        elif m.geom_body[g1] == b:
            sign = -1.0
        if sign == 0.0:
            continue
        fw = sign * (data.contact_force[c] @ data.contact_frame[c])
        tau = tau + jnp.cross(data.contact_pos[c] - p0, fw)
    return site_xmat(m, data, site_id).T @ tau
