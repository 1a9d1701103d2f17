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

import jax
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
    (M.PLANE, M.ELLIPSOID): 1,
    (M.SPHERE, M.SPHERE): 1,
    (M.SPHERE, M.CAPSULE): 1,
    (M.CAPSULE, M.CAPSULE): 1,
    (M.SPHERE, M.BOX): 1,
    (M.CAPSULE, M.BOX): 2,
    (M.BOX, M.BOX): 8,
    (M.HFIELD, M.SPHERE): 1,
    (M.HFIELD, M.CAPSULE): 2,
    (M.HFIELD, M.ELLIPSOID): 1,
}


def body_weldid(m: M.Model) -> List[int]:
    """MuJoCo body_weldid: ancestor reached by walking up through
    jointless bodies. A body with no joints is rigidly welded to its
    parent and counts as the same body for contact filtering (the CMU
    humanoid's lhipjoint/rhipjoint dummies weld to root)."""
    has_joint = set(m.jnt_body)
    weld = [0] * m.nbody
    for b in range(1, m.nbody):
        w = b
        while w != 0 and w not in has_joint:
            w = m.body_parent[w]
        weld[b] = w
    return weld


def candidate_pairs(m: M.Model,
                    include_geom_geom: bool = True) -> List[Tuple[int, int]]:
    """Static candidate list with MuJoCo's filtering semantics
    (engine_collision_driver mj_collideGeoms): same-*weld* filter,
    weld-aware parent-child filter, contype/conaffinity mask."""
    excludes = frozenset(getattr(m, 'contact_excludes', ()) or ())
    weld = body_weldid(m)
    pweld = [weld[m.body_parent[w]] for w in weld]
    pairs = []
    for g1 in range(m.ngeom):
        for g2 in range(g1 + 1, m.ngeom):
            b1, b2 = m.geom_body[g1], m.geom_body[g2]
            w1, w2 = weld[b1], weld[b2]
            if w1 == w2:
                continue
            # explicit <contact><exclude body1 body2/> pairs
            if (b1, b2) in excludes or (b2, b1) in excludes:
                continue
            # parent-child filter on welds (world-welded exempt)
            if w1 != 0 and w2 != 0 and (
                    pweld[b1] == w2 or pweld[b2] == w1):
                continue
            mask = ((m.geom_contype[g1] & m.geom_conaffinity[g2]) or
                    (m.geom_contype[g2] & m.geom_conaffinity[g1]))
            if not mask:
                continue
            t1, t2 = m.geom_type[g1], m.geom_type[g2]
            key = (t1, t2) if (t1, t2) in _PAIR_POINTS else (t2, t1)
            if key not in _PAIR_POINTS:
                continue
            # terrain (plane/heightfield) pairs are always candidates;
            # geom-geom pairs only when enabled for the model
            if (not include_geom_geom and M.PLANE not in (t1, t2)
                    and M.HFIELD not in (t1, t2)):
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


# --------------------------------------------------------------------------
# Batched per-pair kernels. Each takes (p1, R1, s1, p2, R2, s2) for ONE pair
# and returns (dist (k,), pos (k, 3), normal (k, 3)) for its k contact
# points; `detect` vmaps each kernel over all same-type pairs at once so the
# narrowphase is a handful of fused batched ops instead of a Python loop —
# the difference between a 40k-equation and a few-hundred-equation XLA
# program on contact-rich models (manipulator: 118 candidate pairs).
# --------------------------------------------------------------------------

def _seg_of(p, R, half):
    axis = R[:, 2]
    return p - half * axis, p + half * axis


def _k_plane_sphere(p1, R1, s1, p2, R2, s2):
    n = R1[:, 2]
    d, pos = _plane_point(p1, n, p2, s2[0])
    return d[None], pos[None], n[None]


def _k_plane_capsule(p1, R1, s1, p2, R2, s2):
    n = R1[:, 2]
    r = s2[0]
    e0, e1 = _seg_of(p2, R2, s2[1])
    d0, pos0 = _plane_point(p1, n, e0, r)
    d1, pos1 = _plane_point(p1, n, e1, r)
    return (jnp.stack([d0, d1]), jnp.stack([pos0, pos1]),
            jnp.stack([n, n]))


_BOX_SIGNS = np.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                       for sz in (-1, 1)], np.float32)


def _k_plane_box(p1, R1, s1, p2, R2, s2):
    n = R1[:, 2]
    corners = _BOX_SIGNS.astype(s2.dtype) * s2          # (8, 3)
    world = p2 + corners @ R2.T                          # (8, 3)
    ds = (world - p1) @ n
    order = jnp.argsort(ds)[:4]                          # 4 deepest corners
    w = world[order]
    d = ds[order]
    pos = w - 0.5 * d[:, None] * n
    return d, pos, jnp.broadcast_to(n, (4, 3))


def _k_plane_ellipsoid(p1, R1, s1, p2, R2, s2):
    """Closed-form ellipsoid-plane: support point along the plane normal.

    For semi-axes (a,b,c) and plane normal n expressed in the ellipsoid
    frame, the extent toward the plane is r = ||diag(a,b,c) n|| and the
    deepest point is -diag(a^2,b^2,c^2) n / r (quadruped torso vs floor).
    """
    n = R1[:, 2]
    n_loc = R2.T @ n
    scaled = s2 * n_loc
    r = jnp.sqrt(jnp.sum(scaled * scaled) + 1e-24)
    d = (p2 - p1) @ n - r
    p_loc = -(s2 * scaled) / r
    point = p2 + R2 @ p_loc
    pos = point - 0.5 * d * n
    return d[None], pos[None], n[None]


def _k_sphere_sphere(p1, R1, s1, p2, R2, s2):
    r1, r2 = s1[0], s2[0]
    dvec = p2 - p1
    dist = jnp.linalg.norm(dvec)
    n = dvec / jnp.maximum(dist, 1e-12)
    d = dist - (r1 + r2)
    pos = p1 + n * (r1 + 0.5 * d)
    return d[None], pos[None], n[None]


def _k_sphere_capsule(p1, R1, s1, p2, R2, s2):
    r1, r2 = s1[0], s2[0]
    e0, e1 = _seg_of(p2, R2, s2[1])
    cp = _closest_segment_point(e0, e1, p1)
    dvec = cp - p1
    dist = jnp.linalg.norm(dvec)
    n = dvec / jnp.maximum(dist, 1e-12)
    d = dist - (r1 + r2)
    pos = p1 + n * (r1 + 0.5 * d)
    return d[None], pos[None], n[None]


def _k_capsule_capsule(p1, R1, s1, p2, R2, s2):
    r1, r2 = s1[0], s2[0]
    a0, a1 = _seg_of(p1, R1, s1[1])
    b0, b1 = _seg_of(p2, R2, s2[1])
    c1, c2 = _closest_segment_segment(a0, a1, b0, b1)
    dvec = c2 - c1
    dist = jnp.linalg.norm(dvec)
    n = dvec / jnp.maximum(dist, 1e-12)
    d = dist - (r1 + r2)
    pos = c1 + n * (r1 + 0.5 * d)
    return d[None], pos[None], n[None]


def _point_box(p_loc, size):
    """Signed distance of a point to a box surface (box frame).

    Returns (dist, n_loc, surf_loc): dist < 0 inside; n_loc is the
    outward normal at the closest surface point surf_loc.
    """
    c = jnp.clip(p_loc, -size, size)
    out_vec = p_loc - c
    out_d = jnp.linalg.norm(out_vec)
    outside = out_d > 1e-9
    face_d = size - jnp.abs(p_loc)              # (3,) >= 0 iff inside
    ax = jnp.argmin(face_d)
    n_in = jnp.eye(3, dtype=p_loc.dtype)[ax] * jnp.sign(p_loc[ax])
    surf_in = p_loc + n_in * face_d[ax]
    n = jnp.where(outside, out_vec / jnp.maximum(out_d, 1e-12), n_in)
    dist = jnp.where(outside, out_d, -jnp.min(face_d))
    surf = jnp.where(outside, c, surf_in)
    return dist, n, surf


def _k_sphere_box(p1, R1, s1, p2, R2, s2):
    r = s1[0]
    p_loc = R2.T @ (p1 - p2)
    d_pt, n_loc, _ = _point_box(p_loc, s2)
    d = d_pt - r
    # contact normal points g1 (sphere) -> g2 (box)
    n = -(R2 @ n_loc)
    pos = p1 + n * (r + 0.5 * d)
    return d[None], pos[None], n[None]


def _k_capsule_box(p1, R1, s1, p2, R2, s2):
    """Capsule vs box via its two deepest spherical samples (ends +
    midpoint of the axis segment) — adequate for gripper/prop scenes;
    deep edge-across-face cases resolve through the endpoint pair."""
    r = s1[0]
    e0, e1 = _seg_of(p1, R1, s1[1])
    samples = jnp.stack([e0, 0.5 * (e0 + e1), e1])        # (3, 3)

    def one(pt):
        p_loc = R2.T @ (pt - p2)
        d_pt, n_loc, _ = _point_box(p_loc, s2)
        d = d_pt - r
        n = -(R2 @ n_loc)
        return d, pt + n * (r + 0.5 * d), n

    ds, poss, ns = jax.vmap(one)(samples)
    order = jnp.argsort(ds)[:2]
    return ds[order], poss[order], ns[order]


_BOX_CORNERS = np.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                         for sz in (-1, 1)], np.float32)


def _k_box_box(p1, R1, s1, p2, R2, s2):
    """Box-box via mutual vertex clipping: the 4 deepest corners of each
    box against the other (8 fixed contact slots). Face-face stacking —
    the stacker's workload — resolves through corner contacts; deep
    edge-edge wedging is approximated by the nearest corner pair."""
    def corners_vs(pa, Ra, sa, pb, Rb, sb, flip):
        w = pb + (_BOX_CORNERS.astype(sb.dtype) * sb) @ Rb.T   # (8, 3)
        p_loc = (w - pa) @ Ra                                   # in a-frame

        def one(pl, wpt):
            d, n_loc, _ = _point_box(pl, sa)
            n = Ra @ n_loc                 # outward from box a
            n = jnp.where(flip, -n, n)
            return d, wpt - 0.5 * d * n, n

        ds, poss, ns = jax.vmap(one)(p_loc, w)
        order = jnp.argsort(ds)[:4]
        return ds[order], poss[order], ns[order]

    # corners of box2 against box1: outward-from-box1 normal = g1 -> g2
    d_a, p_a, n_a = corners_vs(p1, R1, s1, p2, R2, s2,
                               jnp.zeros((), bool))
    # corners of box1 against box2: flip so the normal stays g1 -> g2
    d_b, p_b, n_b = corners_vs(p2, R2, s2, p1, R1, s1,
                               jnp.ones((), bool))
    return (jnp.concatenate([d_a, d_b]), jnp.concatenate([p_a, p_b]),
            jnp.concatenate([n_a, n_b]))


# --------------------------------------------------------------------------
# Heightfield terrain (quadruped escape). One hfield asset per model; the
# surface is sampled bilinearly and contacts are computed against the
# local tangent plane (height + finite-difference normal).
# --------------------------------------------------------------------------

def hfield_height_normal(m: M.Model, x, y):
    """Terrain height and outward normal at world (x, y)."""
    rx, ry = m.hfield_size[0], m.hfield_size[1]
    z_top = m.hfield_size[2]
    px, py, pz = m.hfield_pos[0], m.hfield_pos[1], m.hfield_pos[2]
    nrow, ncol = m.hfield_nrow, m.hfield_ncol

    def sample(xq, yq):
        u = (xq - px + rx) / (2.0 * rx) * (ncol - 1)
        v = (yq - py + ry) / (2.0 * ry) * (nrow - 1)
        u = jnp.clip(u, 0.0, ncol - 1.001)
        v = jnp.clip(v, 0.0, nrow - 1.001)
        u0 = jnp.floor(u).astype(jnp.int32)
        v0 = jnp.floor(v).astype(jnp.int32)
        fu, fv = u - u0, v - v0
        d = m.hfield_data
        h00 = d[v0, u0]
        h01 = d[v0, u0 + 1]
        h10 = d[v0 + 1, u0]
        h11 = d[v0 + 1, u0 + 1]
        h = ((1 - fv) * ((1 - fu) * h00 + fu * h01)
             + fv * ((1 - fu) * h10 + fu * h11))
        return h * z_top + pz

    h = sample(x, y)
    eps_x = 2.0 * rx / (ncol - 1)
    eps_y = 2.0 * ry / (nrow - 1)
    dhdx = (sample(x + eps_x, y) - sample(x - eps_x, y)) / (2 * eps_x)
    dhdy = (sample(x, y + eps_y) - sample(x, y - eps_y)) / (2 * eps_y)
    n = jnp.stack([-dhdx, -dhdy, jnp.ones_like(dhdx)])
    return h, n / jnp.linalg.norm(n)


def _hf_point(m, point, radius):
    """Sphere-of-radius at `point` vs the terrain's tangent plane."""
    h, n = hfield_height_normal(m, point[0], point[1])
    q = jnp.stack([point[0], point[1], h])
    dist = n @ (point - q) - radius
    pos = point - n * (radius + 0.5 * dist)
    return dist, pos, n


def _k_hfield_sphere(m):
    def kernel(p1, R1, s1, p2, R2, s2):
        d, pos, n = _hf_point(m, p2, s2[0])
        return d[None], pos[None], n[None]
    return kernel


def _k_hfield_capsule(m):
    def kernel(p1, R1, s1, p2, R2, s2):
        e0, e1 = _seg_of(p2, R2, s2[1])
        d0, pos0, n0 = _hf_point(m, e0, s2[0])
        d1, pos1, n1 = _hf_point(m, e1, s2[0])
        return (jnp.stack([d0, d1]), jnp.stack([pos0, pos1]),
                jnp.stack([n0, n1]))
    return kernel


def _k_hfield_ellipsoid(m):
    def kernel(p1, R1, s1, p2, R2, s2):
        # support point of the ellipsoid against the local tangent plane
        h, n = hfield_height_normal(m, p2[0], p2[1])
        n_loc = R2.T @ n
        scaled = s2 * n_loc
        r = jnp.sqrt(jnp.sum(scaled * scaled) + 1e-24)
        q = jnp.stack([p2[0], p2[1], h])
        d = n @ (p2 - q) - r
        point = p2 + R2 @ (-(s2 * scaled) / r)
        pos = point - 0.5 * d * n
        return d[None], pos[None], n[None]
    return kernel


_HFIELD_KERNELS = {
    (M.HFIELD, M.SPHERE): _k_hfield_sphere,
    (M.HFIELD, M.CAPSULE): _k_hfield_capsule,
    (M.HFIELD, M.ELLIPSOID): _k_hfield_ellipsoid,
}


_KERNELS = {
    (M.PLANE, M.SPHERE): _k_plane_sphere,
    (M.PLANE, M.CAPSULE): _k_plane_capsule,
    (M.PLANE, M.BOX): _k_plane_box,
    (M.PLANE, M.ELLIPSOID): _k_plane_ellipsoid,
    (M.SPHERE, M.SPHERE): _k_sphere_sphere,
    (M.SPHERE, M.CAPSULE): _k_sphere_capsule,
    (M.CAPSULE, M.CAPSULE): _k_capsule_capsule,
    (M.SPHERE, M.BOX): _k_sphere_box,
    (M.CAPSULE, M.BOX): _k_capsule_box,
    (M.BOX, M.BOX): _k_box_box,
}


def _combine_batched(m: M.Model, ga: np.ndarray, gb: np.ndarray):
    """Vectorized _combine over pair index arrays (same math, batched)."""
    pri = np.asarray(m.geom_priority)
    p1, p2 = pri[ga], pri[gb]
    fr1, fr2 = m.geom_friction[ga], m.geom_friction[gb]
    sr1, sr2 = m.geom_solref[ga], m.geom_solref[gb]
    si1, si2 = m.geom_solimp[ga], m.geom_solimp[gb]
    s1 = m.geom_solmix[ga]
    s2 = m.geom_solmix[gb]
    mix = (s1 / jnp.maximum(s1 + s2, 1e-12))[:, None]
    fr_mixed = jnp.maximum(fr1, fr2)
    sr_mixed = mix * sr1 + (1 - mix) * sr2
    si_mixed = mix * si1 + (1 - mix) * si2
    take1 = (p1 > p2)[:, None]
    take2 = (p2 > p1)[:, None]
    friction = jnp.where(take1, fr1, jnp.where(take2, fr2, fr_mixed))
    solref = jnp.where(take1, sr1, jnp.where(take2, sr2, sr_mixed))
    solimp = jnp.where(take1, si1, jnp.where(take2, si2, si_mixed))
    return friction, solref, solimp


def detect(m: M.Model, geom_xpos, geom_xmat,
           pairs: List[Tuple[int, int]]) -> Contact:
    """Evaluate all candidate pairs -> fixed-size Contact batch.

    Pairs are grouped by geom-type combination and each group is evaluated
    as ONE vmapped kernel call; results scatter back into the original
    emission order, so the contact row layout (and therefore constraint-
    solver sweep order) is identical to a sequential per-pair evaluation.
    """
    dtype = geom_xpos.dtype
    if not pairs:
        return Contact(
            dist=jnp.zeros((0,), dtype), pos=jnp.zeros((0, 3), dtype),
            frame=jnp.zeros((0, 3, 3), dtype), geom1=(), geom2=(),
            friction=jnp.zeros((0, 3), dtype),
            solref=jnp.zeros((0, 2), dtype),
            solimp=jnp.zeros((0, 5), dtype))

    # static bookkeeping: per-pair type key, row offsets, per-row pair index
    keys = [(m.geom_type[g1], m.geom_type[g2]) for g1, g2 in pairs]
    npts = [_PAIR_POINTS[k] for k in keys]
    offsets = np.concatenate([[0], np.cumsum(npts)[:-1]]).astype(np.int64)
    C = int(sum(npts))
    row_pair = np.repeat(np.arange(len(pairs)), npts)
    g1_rows = tuple(pairs[i][0] for i in row_pair)
    g2_rows = tuple(pairs[i][1] for i in row_pair)

    groups: dict = {}
    for i, k in enumerate(keys):
        groups.setdefault(k, []).append(i)

    dist = jnp.zeros((C,), dtype)
    pos = jnp.zeros((C, 3), dtype)
    nrm = jnp.zeros((C, 3), dtype)
    for key, idxs in groups.items():
        k = _PAIR_POINTS[key]
        ga = np.array([pairs[i][0] for i in idxs])
        gb = np.array([pairs[i][1] for i in idxs])
        fn = (_HFIELD_KERNELS[key](m) if key in _HFIELD_KERNELS
              else _KERNELS[key])
        d, p, n = jax.vmap(fn)(
            geom_xpos[ga], geom_xmat[ga], m.geom_size[ga],
            geom_xpos[gb], geom_xmat[gb], m.geom_size[gb])
        rows = np.concatenate([offsets[i] + np.arange(k) for i in idxs])
        dist = dist.at[rows].set(d.reshape(-1))
        pos = pos.at[rows].set(p.reshape(-1, 3))
        nrm = nrm.at[rows].set(n.reshape(-1, 3))

    # tangent frames for all rows at once
    t1, t2 = jax.vmap(_tangent_frame)(nrm)
    frame = jnp.stack([nrm, t1, t2], axis=1)

    # combined contact parameters, per pair then repeated per point
    ga_all = np.array([g1 for g1, _ in pairs])
    gb_all = np.array([g2 for _, g2 in pairs])
    friction, solref, solimp = _combine_batched(m, ga_all, gb_all)

    return Contact(
        dist=dist, pos=pos, frame=frame, geom1=g1_rows, geom2=g2_rows,
        friction=friction[row_pair], solref=solref[row_pair],
        solimp=solimp[row_pair])
