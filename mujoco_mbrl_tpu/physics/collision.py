"""Collision detection: static candidate pairs -> fixed-size contact set.

Replaces the narrowphase half of libmujoco's collision pipeline for the
geom pairs the task suite actually exercises (SURVEY §7.4): sphere/capsule/
box vs plane, plus sphere-sphere / sphere-capsule / capsule-capsule.

TPU design: the candidate pair list is computed at compile time from static
model fields (contype/conaffinity masks, same-body and parent-child
filtering — mirroring MuJoCo's filtering semantics), so every step evaluates
a FIXED number of potential contacts; inactive ones are masked by distance.
No dynamic shapes, no broadphase — suite models have O(10) geoms.
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from . import model as M


class Contact(NamedTuple):
    """Fixed-size batch of potential contacts for one configuration."""
    dist: jnp.ndarray     # (C,) signed distance (negative = penetrating)
    pos: jnp.ndarray      # (C, 3) contact point (world)
    frame: jnp.ndarray    # (C, 3, 3) rows: normal (g1->g2), tangent1, tangent2
    geom1: Tuple[int, ...]
    geom2: Tuple[int, ...]
    friction: jnp.ndarray  # (C, 3) combined slide/torsion/roll
    solref: jnp.ndarray    # (C, 2)
    solimp: jnp.ndarray    # (C, 5)


# supported type pairs and the number of contact points each generates
_PAIR_POINTS = {
    (M.PLANE, M.SPHERE): 1,
    (M.PLANE, M.CAPSULE): 2,
    (M.PLANE, M.BOX): 4,
    (M.SPHERE, M.SPHERE): 1,
    (M.SPHERE, M.CAPSULE): 1,
    (M.CAPSULE, M.CAPSULE): 1,
}


def candidate_pairs(m: M.Model,
                    include_geom_geom: bool = True) -> List[Tuple[int, int]]:
    """Static candidate list with MuJoCo's filtering semantics:
    same-body filter, parent-child filter, contype/conaffinity mask."""
    pairs = []
    for g1 in range(m.ngeom):
        for g2 in range(g1 + 1, m.ngeom):
            b1, b2 = m.geom_body[g1], m.geom_body[g2]
            if b1 == b2:
                continue
            # parent-child filter (world parent exempt, as in MuJoCo)
            if b1 != 0 and b2 != 0 and (
                    m.body_parent[b1] == b2 or m.body_parent[b2] == b1):
                continue
            mask = ((m.geom_contype[g1] & m.geom_conaffinity[g2]) or
                    (m.geom_contype[g2] & m.geom_conaffinity[g1]))
            if not mask:
                continue
            t1, t2 = m.geom_type[g1], m.geom_type[g2]
            key = (t1, t2) if (t1, t2) in _PAIR_POINTS else (t2, t1)
            if key not in _PAIR_POINTS:
                continue
            if not include_geom_geom and M.PLANE not in (t1, t2):
                continue
            # order so the canonical type comes first
            if (t1, t2) == key:
                pairs.append((g1, g2))
            else:
                pairs.append((g2, g1))
    return pairs


def _combine(m: M.Model, g1: int, g2: int):
    """Combine per-geom contact parameters (mju_combine semantics:
    priority wins; else friction = elementwise max, solref/solimp mixed
    by solmix weight)."""
    p1, p2 = m.geom_priority[g1], m.geom_priority[g2]
    if p1 > p2:
        return m.geom_friction[g1], m.geom_solref[g1], m.geom_solimp[g1]
    if p2 > p1:
        return m.geom_friction[g2], m.geom_solref[g2], m.geom_solimp[g2]
    friction = jnp.maximum(m.geom_friction[g1], m.geom_friction[g2])
    s1 = m.geom_solmix[g1]
    s2 = m.geom_solmix[g2]
    mix = s1 / jnp.maximum(s1 + s2, 1e-12)
    solref = mix * m.geom_solref[g1] + (1 - mix) * m.geom_solref[g2]
    solimp = mix * m.geom_solimp[g1] + (1 - mix) * m.geom_solimp[g2]
    return friction, solref, solimp


def _tangent_frame(n):
    """Orthonormal (t1, t2) completing normal n."""
    ref = jnp.where(jnp.abs(n[0]) < 0.5,
                    jnp.array([1.0, 0.0, 0.0], n.dtype),
                    jnp.array([0.0, 1.0, 0.0], n.dtype))
    t1 = jnp.cross(n, ref)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1), 1e-12)
    t2 = jnp.cross(n, t1)
    return t1, t2


def _capsule_segment(m, g, xpos, xmat):
    """World endpoints of a capsule's axis segment."""
    half = m.geom_size[g, 1]
    axis = xmat[:, 2]
    return xpos - half * axis, xpos + half * axis


def _plane_point(plane_pos, plane_n, point, radius):
    """Contact of a sphere (center `point`, radius) with a plane."""
    dist = plane_n @ (point - plane_pos) - radius
    pos = point - (radius + 0.5 * dist) * plane_n
    return dist, pos


def _closest_segment_point(a0, a1, p):
    d = a1 - a0
    t = jnp.clip(((p - a0) @ d) / jnp.maximum(d @ d, 1e-12), 0.0, 1.0)
    return a0 + t * d


def _closest_segment_segment(a0, a1, b0, b1):
    """Closest points between two segments (standard clamped solve)."""
    d1 = a1 - a0
    d2 = b1 - b0
    r = a0 - b0
    a = d1 @ d1
    e = d2 @ d2
    f = d2 @ r
    c = d1 @ r
    b = d1 @ d2
    denom = a * e - b * b
    s = jnp.where(denom > 1e-12, jnp.clip((b * f - c * e) / jnp.maximum(
        denom, 1e-12), 0.0, 1.0), 0.0)
    t = (b * s + f) / jnp.maximum(e, 1e-12)
    t_clamped = jnp.clip(t, 0.0, 1.0)
    s = jnp.clip((b * t_clamped - c) / jnp.maximum(a, 1e-12), 0.0, 1.0)
    p1 = a0 + d1 * s
    p2 = b0 + d2 * t_clamped
    return p1, p2


def detect(m: M.Model, geom_xpos, geom_xmat,
           pairs: List[Tuple[int, int]]) -> Contact:
    """Evaluate all candidate pairs -> fixed-size Contact batch."""
    dtype = geom_xpos.dtype
    dists, poss, frames = [], [], []
    g1s, g2s, fricts, solrefs, solimps = [], [], [], [], []

    def emit(g1, g2, dist, pos, n):
        t1, t2 = _tangent_frame(n)
        dists.append(dist)
        poss.append(pos)
        frames.append(jnp.stack([n, t1, t2]))
        g1s.append(g1)
        g2s.append(g2)
        fr, sr, si = _combine(m, g1, g2)
        fricts.append(fr)
        solrefs.append(sr)
        solimps.append(si)

    for g1, g2 in pairs:
        t1, t2 = m.geom_type[g1], m.geom_type[g2]
        p1, p2 = geom_xpos[g1], geom_xpos[g2]
        R1, R2 = geom_xmat[g1], geom_xmat[g2]

        if t1 == M.PLANE:
            n = R1[:, 2]
            if t2 == M.SPHERE:
                d, pos = _plane_point(p1, n, p2, m.geom_size[g2, 0])
                emit(g1, g2, d, pos, n)
            elif t2 == M.CAPSULE:
                r = m.geom_size[g2, 0]
                e0, e1 = _capsule_segment(m, g2, p2, R2)
                for e in (e0, e1):
                    d, pos = _plane_point(p1, n, e, r)
                    emit(g1, g2, d, pos, n)
            elif t2 == M.BOX:
                # 4 deepest corners: evaluate all 8, keep per-corner rows
                # for the -z face pairings; simpler: all 8 masked by depth
                # would double rows, so take the 4 corners on the side
                # facing the plane via sign of projection.
                size = m.geom_size[g2]
                corners = []
                for sx in (-1, 1):
                    for sy in (-1, 1):
                        for sz in (-1, 1):
                            corners.append(jnp.array([sx, sy, sz],
                                                     dtype) * size)
                # pick 4 lowest corners by distance to plane
                world = [p2 + R2 @ c for c in corners]
                ds = jnp.stack([n @ (w - p1) for w in world])
                order = jnp.argsort(ds)[:4]
                wstack = jnp.stack(world)
                for k in range(4):
                    w = wstack[order[k]]
                    d = ds[order[k]]
                    emit(g1, g2, d, w - 0.5 * d * n, n)
        elif t1 == M.SPHERE and t2 == M.SPHERE:
            r1, r2 = m.geom_size[g1, 0], m.geom_size[g2, 0]
            dvec = p2 - p1
            dist = jnp.linalg.norm(dvec)
            n = dvec / jnp.maximum(dist, 1e-12)
            d = dist - (r1 + r2)
            pos = p1 + n * (r1 + 0.5 * d)
            emit(g1, g2, d, pos, n)
        elif t1 == M.SPHERE and t2 == M.CAPSULE:
            r1, r2 = m.geom_size[g1, 0], m.geom_size[g2, 0]
            e0, e1 = _capsule_segment(m, g2, p2, R2)
            cp = _closest_segment_point(e0, e1, p1)
            dvec = cp - p1
            dist = jnp.linalg.norm(dvec)
            n = dvec / jnp.maximum(dist, 1e-12)
            d = dist - (r1 + r2)
            pos = p1 + n * (r1 + 0.5 * d)
            emit(g1, g2, d, pos, n)
        elif t1 == M.CAPSULE and t2 == M.CAPSULE:
            r1, r2 = m.geom_size[g1, 0], m.geom_size[g2, 0]
            a0, a1 = _capsule_segment(m, g1, p1, R1)
            b0, b1 = _capsule_segment(m, g2, p2, R2)
            c1, c2 = _closest_segment_segment(a0, a1, b0, b1)
            dvec = c2 - c1
            dist = jnp.linalg.norm(dvec)
            n = dvec / jnp.maximum(dist, 1e-12)
            d = dist - (r1 + r2)
            pos = c1 + n * (r1 + 0.5 * d)
            emit(g1, g2, d, pos, n)

    if not dists:
        return Contact(
            dist=jnp.zeros((0,), dtype), pos=jnp.zeros((0, 3), dtype),
            frame=jnp.zeros((0, 3, 3), dtype), geom1=(), geom2=(),
            friction=jnp.zeros((0, 3), dtype),
            solref=jnp.zeros((0, 2), dtype),
            solimp=jnp.zeros((0, 5), dtype))

    return Contact(
        dist=jnp.stack(dists), pos=jnp.stack(poss),
        frame=jnp.stack(frames), geom1=tuple(g1s), geom2=tuple(g2s),
        friction=jnp.stack(fricts), solref=jnp.stack(solrefs),
        solimp=jnp.stack(solimps))
