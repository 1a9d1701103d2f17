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
        if t1 == M.PLANE and t2 == M.CAPSULE:
            n = 2
        elif t1 == M.PLANE and t2 == M.BOX:
            n = 4
        else:
            n = 1
        layout.extend([(g1, g2)] * n)
    return layout


def touch(m: M.Model, data: M.Data, site_id: int, geom_id: int,
          radius: float = 0.1) -> jnp.ndarray:
    """Touch sensor: sum of contact normal forces on `geom_id` within
    `radius` of the site (approximates MuJoCo's site-volume test)."""
    layout = contact_layout(m)
    total = jnp.zeros((), data.contact_force.dtype)
    for c, (g1, g2) in enumerate(layout):
        if geom_id not in (g1, g2):
            continue
        d = jnp.linalg.norm(data.contact_pos[c] - data.site_xpos[site_id])
        near = (d < radius).astype(total.dtype)
        active = (data.contact_dist[c] < 0).astype(total.dtype)
        total = total + near * active * jnp.maximum(
            data.contact_force[c, 0], 0.0)
    return total
