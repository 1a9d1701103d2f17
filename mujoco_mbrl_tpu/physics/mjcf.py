"""MJCF-subset compiler: XML string -> :class:`Model` pytree (host-side).

This module replaces the reference's entire native model-loading path —
autowrap-generated ctypes bindings + ``mj_loadXML`` inside libmujoco.so
(reference ``dm_control/dm_control/autowrap/*`` and
``dm_control/dm_control/mujoco/wrapper/core.py:288-353``) — with an
ahead-of-time Python compiler. The output is a static pytree consumed by the
jitted step function, so model topology is fixed at trace time (XLA-friendly).

Supported MJCF subset (what the dm_control suite task models need):
  * compiler: angle (degree default), settotalmass (ignored), eulerseq xyz
  * option: timestep, gravity, integrator, viscosity, density, wind,
    flag contact/gravity/limit/actuation (enable/disable)
  * default classes, nested, with childclass inheritance
  * worldbody tree: body (pos/quat/euler/zaxis/axisangle/childclass),
    joint (free/ball/slide/hinge), geom (plane/sphere/capsule/cylinder/
    box/ellipsoid; fromto; mass or density), site, inertial
  * tendon/fixed (linear joint couplings)
  * actuator: motor, position, velocity, general

Unsupported-but-parsed-gracefully: light, camera, asset/material references
(visual only in the suite models), sensors.
"""

from __future__ import annotations

import math
import xml.etree.ElementTree as ET
from typing import Dict, List, Optional

import numpy as np

from . import model as M


# --------------------------------------------------------------------------
# numpy quaternion helpers (compile-time only)
# --------------------------------------------------------------------------

def _nquat_mul(u, v):
    w1, x1, y1, z1 = u
    w2, x2, y2, z2 = v
    return np.array([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ])


def _nquat_axis_angle(axis, angle):
    axis = np.asarray(axis, dtype=np.float64)
    n = np.linalg.norm(axis)
    if n < 1e-14:
        return np.array([1.0, 0, 0, 0])
    axis = axis / n
    return np.concatenate([[math.cos(angle / 2)], axis * math.sin(angle / 2)])


def _nquat_rot(q, v):
    u, w = q[1:], q[0]
    uv = np.cross(u, v)
    return v + 2.0 * np.cross(u, uv + w * v)


def _nquat_to_mat(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def _mat_to_nquat(R):
    """Rotation matrix -> unit quaternion (w, x, y, z)."""
    R = np.asarray(R, dtype=np.float64)
    tr = np.trace(R)
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        w = 0.25 * s
        x = (R[2, 1] - R[1, 2]) / s
        y = (R[0, 2] - R[2, 0]) / s
        z = (R[1, 0] - R[0, 1]) / s
    elif R[0, 0] > R[1, 1] and R[0, 0] > R[2, 2]:
        s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2
        w = (R[2, 1] - R[1, 2]) / s
        x = 0.25 * s
        y = (R[0, 1] + R[1, 0]) / s
        z = (R[0, 2] + R[2, 0]) / s
    elif R[1, 1] > R[2, 2]:
        s = np.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2
        w = (R[0, 2] - R[2, 0]) / s
        x = (R[0, 1] + R[1, 0]) / s
        y = 0.25 * s
        z = (R[1, 2] + R[2, 1]) / s
    else:
        s = np.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2
        w = (R[1, 0] - R[0, 1]) / s
        x = (R[0, 2] + R[2, 0]) / s
        y = (R[1, 2] + R[2, 1]) / s
        z = 0.25 * s
    q = np.array([w, x, y, z])
    return q / np.linalg.norm(q)


def _zaxis_quat(z):
    """Minimal rotation taking (0,0,1) to direction z."""
    z = np.asarray(z, dtype=np.float64)
    z = z / np.linalg.norm(z)
    e = np.array([0.0, 0.0, 1.0])
    c = float(np.dot(e, z))
    if c > 1 - 1e-12:
        return np.array([1.0, 0, 0, 0])
    if c < -1 + 1e-12:
        return np.array([0.0, 1.0, 0, 0])  # 180deg about x
    axis = np.cross(e, z)
    angle = math.acos(max(-1.0, min(1.0, c)))
    return _nquat_axis_angle(axis, angle)


# --------------------------------------------------------------------------
# Attribute parsing
# --------------------------------------------------------------------------

def _floats(s: str) -> np.ndarray:
    return np.array([float(x) for x in s.split()], dtype=np.float64)


_JOINT_TYPES = {'free': M.FREE, 'ball': M.BALL, 'slide': M.SLIDE,
                'hinge': M.HINGE}
_GEOM_TYPES = {'plane': M.PLANE, 'hfield': M.HFIELD, 'sphere': M.SPHERE,
               'capsule': M.CAPSULE, 'ellipsoid': M.ELLIPSOID,
               'cylinder': M.CYLINDER, 'box': M.BOX}
_QPOS_WIDTH = {M.FREE: 7, M.BALL: 4, M.SLIDE: 1, M.HINGE: 1}
_DOF_WIDTH = {M.FREE: 6, M.BALL: 3, M.SLIDE: 1, M.HINGE: 1}

_DEFAULT_SOLREF = np.array([0.02, 1.0])
_DEFAULT_SOLIMP = np.array([0.9, 0.95, 0.001, 0.5, 2.0])


class _Defaults:
    """Nested default-class resolution (MJCF <default> tree)."""

    def __init__(self):
        # class name -> tag -> {attr: value}
        self.classes: Dict[str, Dict[str, Dict[str, str]]] = {'main': {}}
        self.parent: Dict[str, Optional[str]] = {'main': None}

    def parse(self, elem: ET.Element, parent: str = 'main'):
        cls = elem.get('class', parent if elem.tag == 'default' else 'main')
        if cls not in self.classes:
            self.classes[cls] = {}
            self.parent[cls] = parent
        for child in elem:
            if child.tag == 'default':
                self.parse(child, cls)
            else:
                tag_defaults = self.classes[cls].setdefault(child.tag, {})
                tag_defaults.update(child.attrib)

    def resolve(self, tag: str, attrib: Dict[str, str],
                cls: Optional[str]) -> Dict[str, str]:
        """Merge defaults (walking up class chain) under explicit attrs."""
        merged: Dict[str, str] = {}
        chain: List[str] = []
        c = cls or 'main'
        while c is not None:
            chain.append(c)
            c = self.parent.get(c)
        if 'main' not in chain:
            chain.append('main')
        for c in reversed(chain):
            merged.update(self.classes.get(c, {}).get(tag, {}))
        merged.update(attrib)
        return merged


class _Builder:
    """Accumulates model arrays while walking the body tree."""

    def __init__(self, angle_in_degrees: bool):
        self.deg = angle_in_degrees
        # bodies (world body is index 0)
        self.body_parent = [0]
        self.body_pos = [np.zeros(3)]
        self.body_quat = [np.array([1.0, 0, 0, 0])]
        self.body_names = {'world': 0}
        # accumulated per-body mass properties
        self.body_mass = [0.0]
        self.body_first_moment = [np.zeros(3)]     # mass * com
        self.body_inertia_at_origin = [np.zeros((3, 3))]  # about body origin
        self.body_explicit_inertial = [False]
        # joints
        self.jnt = []          # dicts
        self.jnt_names = {}
        # geoms / sites
        self.geoms = []
        self.geom_names = {}
        self.sites = []
        self.site_names = {}
        # cameras (engine.py:515-760 Camera poses; rendered by
        # utils.render ray casting rather than GL)
        self.cameras = []
        self.camera_names = {}

    # -- angles ----------------------------------------------------------
    def angle(self, a: float) -> float:
        return math.radians(a) if self.deg else a

    def orientation(self, attrs: Dict[str, str]) -> np.ndarray:
        if 'quat' in attrs:
            q = _floats(attrs['quat'])
            return q / np.linalg.norm(q)
        if 'xyaxes' in attrs:
            v = _floats(attrs['xyaxes'])
            x = v[:3] / np.linalg.norm(v[:3])
            y = v[3:] - (v[3:] @ x) * x
            y = y / np.linalg.norm(y)
            z = np.cross(x, y)
            return _mat_to_nquat(np.stack([x, y, z], axis=1))
        if 'euler' in attrs:
            e = [self.angle(a) for a in _floats(attrs['euler'])]
            q = np.array([1.0, 0, 0, 0])
            axes = [np.array([1.0, 0, 0]), np.array([0, 1.0, 0]),
                    np.array([0, 0, 1.0])]
            for ax, ang in zip(axes, e):   # intrinsic xyz (MJCF default)
                q = _nquat_mul(q, _nquat_axis_angle(ax, ang))
            return q
        if 'zaxis' in attrs:
            return _zaxis_quat(_floats(attrs['zaxis']))
        if 'axisangle' in attrs:
            aa = _floats(attrs['axisangle'])
            return _nquat_axis_angle(aa[:3], self.angle(aa[3]))
        return np.array([1.0, 0, 0, 0])


def _geom_volume(gtype: int, size: np.ndarray) -> float:
    r = size[0]
    if gtype == M.SPHERE:
        return 4.0 / 3.0 * math.pi * r ** 3
    if gtype == M.CAPSULE:
        return math.pi * r * r * (2 * size[1]) + 4.0 / 3.0 * math.pi * r ** 3
    if gtype == M.CYLINDER:
        return math.pi * r * r * 2 * size[1]
    if gtype == M.BOX:
        return 8.0 * size[0] * size[1] * size[2]
    if gtype == M.ELLIPSOID:
        return 4.0 / 3.0 * math.pi * size[0] * size[1] * size[2]
    return 0.0  # plane: massless


def _geom_inertia(gtype: int, size: np.ndarray, mass: float) -> np.ndarray:
    """Diagonal inertia about geom CoM in the geom frame (z = symmetry axis).

    Formulas match MuJoCo's compile-time inertia computation so that bodies
    assembled from primitive geoms have identical mass matrices.
    """
    r = size[0]
    if gtype == M.SPHERE:
        i = 0.4 * mass * r * r
        return np.diag([i, i, i])
    if gtype == M.CAPSULE:
        h = size[1]
        height = 2 * h
        sphere_mass = mass * 4 * r / (4 * r + 3 * height)
        cyl_mass = mass - sphere_mass
        ixy = cyl_mass * (3 * r * r + height * height) / 12.0
        iz = cyl_mass * r * r / 2.0
        sph_i = 0.4 * sphere_mass * r * r
        ixy += sph_i + sphere_mass * height * (3 * r + 2 * height) / 8.0
        iz += sph_i
        return np.diag([ixy, ixy, iz])
    if gtype == M.CYLINDER:
        h2 = (2 * size[1]) ** 2
        ixy = mass * (3 * r * r + h2) / 12.0
        iz = mass * r * r / 2.0
        return np.diag([ixy, ixy, iz])
    if gtype == M.BOX:
        a2, b2, c2 = (2 * size) ** 2
        return np.diag([mass * (b2 + c2) / 12.0, mass * (a2 + c2) / 12.0,
                        mass * (a2 + b2) / 12.0])
    if gtype == M.ELLIPSOID:
        a2, b2, c2 = size ** 2
        return np.diag([mass * (b2 + c2) / 5.0, mass * (a2 + c2) / 5.0,
                        mass * (a2 + b2) / 5.0])
    return np.zeros((3, 3))


def parse(xml_string: str, dtype=np.float32) -> M.Model:
    """Compile an MJCF XML string into a :class:`Model` pytree."""
    root = ET.fromstring(xml_string)
    assert root.tag == 'mujoco'

    compiler = root.find('compiler')
    angle_deg = True
    settotalmass = None
    if compiler is not None:
        if compiler.get('angle') == 'radian':
            angle_deg = False
        if 'settotalmass' in compiler.attrib:
            settotalmass = float(compiler.get('settotalmass'))

    # ---- option ----------------------------------------------------------
    timestep = 0.002
    gravity = np.array([0.0, 0.0, -9.81])
    integrator = M.EULER
    viscosity = 0.0
    density = 0.0
    wind = np.zeros(3)
    disableflags = 0
    cone = 'pyramidal'
    impratio = 1.0
    solver_iterations = 30
    opt_el = root.find('option')
    if opt_el is not None:
        timestep = float(opt_el.get('timestep', timestep))
        cone = opt_el.get('cone', cone)
        impratio = float(opt_el.get('impratio', impratio))
        solver_iterations = int(opt_el.get('iterations', 30))
        if 'gravity' in opt_el.attrib:
            gravity = _floats(opt_el.get('gravity'))
        if opt_el.get('integrator', 'Euler') == 'RK4':
            integrator = M.RK4
        viscosity = float(opt_el.get('viscosity', 0.0))
        density = float(opt_el.get('density', 0.0))
        if 'wind' in opt_el.attrib:
            wind = _floats(opt_el.get('wind'))
        flag = opt_el.find('flag')
        if flag is not None:
            if flag.get('contact') == 'disable':
                disableflags |= M.DSBL_CONTACT
            if flag.get('gravity') == 'disable':
                disableflags |= M.DSBL_GRAVITY
            if flag.get('limit') == 'disable':
                disableflags |= M.DSBL_LIMIT
            if flag.get('actuation') == 'disable':
                disableflags |= M.DSBL_ACTUATION

    # ---- defaults --------------------------------------------------------
    defaults = _Defaults()
    for d in root.findall('default'):
        defaults.parse(d)

    b = _Builder(angle_deg)

    # ---- body tree -------------------------------------------------------
    def add_geom(attrs: Dict[str, str], body_id: int):
        gtype = _GEOM_TYPES[attrs.get('type', 'sphere')]
        if 'fromto' in attrs and gtype == M.SPHERE:
            gtype = M.CAPSULE   # fromto implies an elongated geom
        size_in = _floats(attrs['size']) if 'size' in attrs else np.zeros(1)
        size = np.zeros(3)
        size[:len(size_in)] = size_in
        quat = b.orientation(attrs)
        pos = _floats(attrs['pos']) if 'pos' in attrs else np.zeros(3)
        if 'fromto' in attrs:
            ft = _floats(attrs['fromto'])
            p0, p1 = ft[:3], ft[3:]
            pos = 0.5 * (p0 + p1)
            # mjModel's fromto frame: +z is the minimal rotation onto the
            # normalized (from - to) direction — i.e. z points from the
            # second endpoint back toward the first (verified against
            # m_geom_quat for fish mouth, cheetah torso, ball_in_cup cup
            # parts, and the quadruped's diagonal shins). The shape is
            # axis-symmetric, but frame-dependent observations (fish
            # mouth-frame target vector) see the difference.
            quat = _zaxis_quat(p0 - p1)
            size[1] = 0.5 * np.linalg.norm(p1 - p0)

        vol = _geom_volume(gtype, size)
        if 'mass' in attrs:
            mass = float(attrs['mass'])
        else:
            geom_density = float(attrs.get('density', 1000.0))
            mass = geom_density * vol

        friction = np.array([1.0, 0.005, 0.0001])
        if 'friction' in attrs:
            f = _floats(attrs['friction'])
            friction[:len(f)] = f
        solref = _DEFAULT_SOLREF.copy()
        if 'solref' in attrs:
            solref[:] = _floats(attrs['solref'])[:2]
        solimp = _DEFAULT_SOLIMP.copy()
        if 'solimp' in attrs:
            si = _floats(attrs['solimp'])
            solimp[:len(si)] = si

        name = attrs.get('name')
        if name:
            b.geom_names[name] = len(b.geoms)
        b.geoms.append(dict(
            type=gtype, body=body_id, pos=pos, quat=quat, size=size,
            friction=friction, solref=solref, solimp=solimp,
            margin=float(attrs.get('margin', 0.0)),
            contype=int(attrs.get('contype', 1)),
            conaffinity=int(attrs.get('conaffinity', 1)),
            condim=int(attrs.get('condim', 3)),
            priority=int(attrs.get('priority', 0)),
            solmix=float(attrs.get('solmix', 1.0)),
        ))

        # accumulate mass properties into the owning body
        if mass > 0.0:
            R = _nquat_to_mat(quat)
            inertia_com = R @ _geom_inertia(gtype, size, mass) @ R.T
            cx = np.array([[0, -pos[2], pos[1]],
                           [pos[2], 0, -pos[0]],
                           [-pos[1], pos[0], 0]])
            b.body_mass[body_id] += mass
            b.body_first_moment[body_id] = (
                b.body_first_moment[body_id] + mass * pos)
            b.body_inertia_at_origin[body_id] = (
                b.body_inertia_at_origin[body_id]
                + inertia_com + mass * (cx @ cx.T))

    def add_site(attrs: Dict[str, str], body_id: int):
        name = attrs.get('name')
        if name:
            b.site_names[name] = len(b.sites)
        stype = attrs.get('type', 'sphere')
        ssize = np.full(3, 0.005)   # MuJoCo site default size
        if 'size' in attrs:
            sz = _floats(attrs['size'])
            ssize[:len(sz)] = sz
            if len(sz) == 1:
                ssize[:] = sz[0]
        b.sites.append(dict(
            body=body_id,
            pos=_floats(attrs['pos']) if 'pos' in attrs else np.zeros(3),
            quat=b.orientation(attrs),
            type=_GEOM_TYPES.get(stype, M.SPHERE),
            size=ssize))

    def add_joint(attrs: Dict[str, str], body_id: int):
        jtype = _JOINT_TYPES[attrs.get('type', 'hinge')]
        rng = np.zeros(2)
        limited = attrs.get('limited', 'false') in ('true', '1')
        if 'range' in attrs:
            rng = _floats(attrs['range'])
            # MuJoCo leaves the (inert) range of explicitly-unlimited
            # joints unconverted (fish.xml tail joints, limited='false');
            # mirror that so jnt_range matches mjModel bit-for-bit.
            if jtype in (M.HINGE, M.BALL) and limited:
                rng = np.array([b.angle(rng[0]), b.angle(rng[1])])
        solref = _DEFAULT_SOLREF.copy()
        if 'solreflimit' in attrs:
            solref[:] = _floats(attrs['solreflimit'])[:2]
        solimp = _DEFAULT_SOLIMP.copy()
        if 'solimplimit' in attrs:
            si = _floats(attrs['solimplimit'])
            solimp[:len(si)] = si
        name = attrs.get('name')
        if name:
            b.jnt_names[name] = len(b.jnt)
        b.jnt.append(dict(
            type=jtype, body=body_id,
            pos=_floats(attrs['pos']) if 'pos' in attrs else np.zeros(3),
            axis=(_floats(attrs['axis']) if 'axis' in attrs
                  else np.array([0.0, 0.0, 1.0])),
            range=rng, limited=limited, solref=solref, solimp=solimp,
            stiffness=float(attrs.get('stiffness', 0.0)),
            springref=b.angle(float(attrs.get('springref', 0.0)))
            if jtype in (M.HINGE, M.BALL)
            else float(attrs.get('springref', 0.0)),
            ref=b.angle(float(attrs.get('ref', 0.0)))
            if jtype == M.HINGE else float(attrs.get('ref', 0.0)),
            damping=float(attrs.get('damping', 0.0)),
            armature=float(attrs.get('armature', 0.0)),
            frictionloss=float(attrs.get('frictionloss', 0.0)),
            margin=float(attrs.get('margin', 0.0)),
        ))

    def walk_body(elem: ET.Element, parent_id: int, childclass: Optional[str]):
        cls = elem.get('childclass', childclass)
        attrs = elem.attrib
        body_id = len(b.body_parent)
        b.body_parent.append(parent_id)
        b.body_pos.append(_floats(attrs['pos']) if 'pos' in attrs
                          else np.zeros(3))
        b.body_quat.append(b.orientation(attrs))
        name = attrs.get('name', f'body{body_id}')
        b.body_names[name] = body_id
        b.body_mass.append(0.0)
        b.body_first_moment.append(np.zeros(3))
        b.body_inertia_at_origin.append(np.zeros((3, 3)))
        b.body_explicit_inertial.append(False)

        for child in elem:
            tag = child.tag
            cattrs = defaults.resolve(tag, child.attrib,
                                      child.attrib.get('class', cls))
            if tag == 'joint':
                add_joint(cattrs, body_id)
            elif tag == 'freejoint':
                cattrs = dict(cattrs)
                cattrs['type'] = 'free'
                # freejoint ignores all defaults except name
                add_joint({'type': 'free', 'name': cattrs.get('name', '')},
                          body_id)
            elif tag == 'geom':
                add_geom(cattrs, body_id)
            elif tag == 'site':
                add_site(cattrs, body_id)
            elif tag == 'inertial':
                mass = float(cattrs['mass'])
                ipos = _floats(cattrs.get('pos', '0 0 0'))
                if 'diaginertia' in cattrs:
                    inert = np.diag(_floats(cattrs['diaginertia']))
                else:
                    f = _floats(cattrs.get(
                        'fullinertia', '1 1 1 0 0 0'))
                    inert = np.array([[f[0], f[3], f[4]],
                                      [f[3], f[1], f[5]],
                                      [f[4], f[5], f[2]]])
                iq = b.orientation(cattrs)
                R = _nquat_to_mat(iq)
                inert = R @ inert @ R.T
                cx = np.array([[0, -ipos[2], ipos[1]],
                               [ipos[2], 0, -ipos[0]],
                               [-ipos[1], ipos[0], 0]])
                b.body_mass[body_id] = mass
                b.body_first_moment[body_id] = mass * ipos
                b.body_inertia_at_origin[body_id] = (
                    inert + mass * (cx @ cx.T))
                b.body_explicit_inertial[body_id] = True
            elif tag == 'camera':
                add_camera(cattrs, body_id)
            elif tag == 'body':
                walk_body(child, body_id, cls)
            # light/etc.: visual-only, skipped.

    def add_camera(attrs: Dict[str, str], body_id: int):
        name = attrs.get('name')
        if name:
            b.camera_names[name] = len(b.cameras)
        b.cameras.append(dict(
            body=body_id,
            pos=_floats(attrs['pos']) if 'pos' in attrs else np.zeros(3),
            quat=b.orientation(attrs),
            fovy=float(attrs.get('fovy', 45.0)),
            mode=attrs.get('mode', 'fixed')))

    worldbody = root.find('worldbody')
    if worldbody is not None:
        for child in worldbody:
            tag = child.tag
            cattrs = defaults.resolve(tag, child.attrib,
                                      child.attrib.get('class'))
            if tag == 'body':
                walk_body(child, 0, child.get('childclass'))
            elif tag == 'geom':
                add_geom(cattrs, 0)
            elif tag == 'site':
                add_site(cattrs, 0)
            elif tag == 'camera':
                add_camera(cattrs, 0)

    nbody = len(b.body_parent)
    njnt = len(b.jnt)

    # ---- joint addressing --------------------------------------------------
    jnt_qposadr, jnt_dofadr = [], []
    nq = nv = 0
    for j in b.jnt:
        jnt_qposadr.append(nq)
        jnt_dofadr.append(nv)
        nq += _QPOS_WIDTH[j['type']]
        nv += _DOF_WIDTH[j['type']]
    dof_jnt, dof_damping, dof_armature, dof_frictionloss = [], [], [], []
    for ji, j in enumerate(b.jnt):
        for _ in range(_DOF_WIDTH[j['type']]):
            dof_jnt.append(ji)
            dof_damping.append(j['damping'])
            dof_armature.append(j['armature'])
            dof_frictionloss.append(j['frictionloss'])

    # ---- qpos0 / qpos_spring -----------------------------------------------
    qpos0 = np.zeros(nq)
    qpos_spring = np.zeros(nq)
    for ji, j in enumerate(b.jnt):
        adr = jnt_qposadr[ji]
        if j['type'] == M.FREE:
            qpos0[adr:adr + 3] = b.body_pos[j['body']]
            qpos0[adr + 3:adr + 7] = b.body_quat[j['body']]
            qpos_spring[adr:adr + 7] = qpos0[adr:adr + 7]
        elif j['type'] == M.BALL:
            qpos0[adr] = 1.0
            qpos_spring[adr] = 1.0
        else:
            qpos0[adr] = j['ref']
            qpos_spring[adr] = j['springref']

    # The world body never moves: MuJoCo keeps it massless regardless of
    # attached geoms (decorations, floor planes); mirror that so body_mass
    # matches mjModel exactly (and settotalmass rescales moving mass only).
    b.body_mass[0] = 0.0
    b.body_first_moment[0] = np.zeros(3)
    b.body_inertia_at_origin[0] = np.zeros((3, 3))

    # ---- compiler settotalmass: rescale all masses/inertias ----------------
    if settotalmass is not None:
        total = sum(b.body_mass)
        if total > 0:
            scale = settotalmass / total
            b.body_mass = [mm * scale for mm in b.body_mass]
            b.body_first_moment = [fm * scale for fm in b.body_first_moment]
            b.body_inertia_at_origin = [ii * scale
                                        for ii in b.body_inertia_at_origin]

    # ---- body mass properties -> (mass, ipos, inertia about CoM) -----------
    body_mass = np.array(b.body_mass)
    body_ipos = np.zeros((nbody, 3))
    body_inertia = np.zeros((nbody, 3, 3))
    for i in range(nbody):
        m_ = b.body_mass[i]
        if m_ > 0:
            com = b.body_first_moment[i] / m_
            body_ipos[i] = com
            cx = np.array([[0, -com[2], com[1]],
                           [com[2], 0, -com[0]],
                           [-com[1], com[0], 0]])
            # parallel axis: inertia about CoM from inertia about origin
            body_inertia[i] = (b.body_inertia_at_origin[i]
                               - m_ * (cx @ cx.T))

    # ---- tendons -------------------------------------------------------------
    tendon_names: Dict[str, int] = {}
    tendon_rows: List[np.ndarray] = []
    tendon_stiffness: List[float] = []
    tendon_damping: List[float] = []
    tendon_jnt: List[tuple] = []
    spatial_tendons: List[tuple] = []
    tendon_el = root.find('tendon')
    if tendon_el is not None:
        for fx in tendon_el.findall('fixed'):
            attrs = defaults.resolve('fixed', fx.attrib,
                                     fx.attrib.get('class'))
            row = np.zeros(nv)
            pairs = []
            for jref in fx.findall('joint'):
                ji = b.jnt_names[jref.get('joint')]
                coef = float(jref.get('coef'))
                row[jnt_dofadr[ji]] = coef
                pairs.append((ji, coef))
            name = attrs.get('name')
            if name:
                tendon_names[name] = len(tendon_rows)
            tendon_rows.append(row)
            tendon_stiffness.append(float(attrs.get('stiffness', 0.0)))
            tendon_damping.append(float(attrs.get('damping', 0.0)))
            tendon_jnt.append(tuple(pairs))
        for sp in tendon_el.findall('spatial'):
            attrs = defaults.resolve('spatial', sp.attrib,
                                     sp.attrib.get('class'))
            sites = [b.site_names[s.get('site')]
                     for s in sp.findall('site')]
            if len(sites) != 2:
                continue  # via-point tendons unsupported (unused by suite)
            limited = attrs.get('limited', 'false') in ('true', '1')
            rng = (_floats(attrs['range']) if 'range' in attrs
                   else np.zeros(2))
            spatial_tendons.append((sites[0], sites[1], limited,
                                    float(rng[0]), float(rng[1])))
    ntendon = len(tendon_rows)
    tendon_moment = (np.stack(tendon_rows) if ntendon
                     else np.zeros((0, nv)))

    # ---- equality constraints (tendon length = 0, soft) --------------------
    eq_tendon: List[tuple] = []
    equality_el = root.find('equality')
    if equality_el is not None:
        for eq in equality_el.findall('tendon'):
            attrs = defaults.resolve('equality', eq.attrib, None)
            attrs.update(eq.attrib)
            t1 = tendon_names[attrs['tendon1']]
            solref = _DEFAULT_SOLREF.copy()
            if 'solref' in attrs:
                solref[:] = _floats(attrs['solref'])[:2]
            solimp = _DEFAULT_SOLIMP.copy()
            if 'solimp' in attrs:
                si = _floats(attrs['solimp'])
                solimp[:len(si)] = si
            eq_tendon.append((t1, tuple(solref.tolist()),
                              tuple(solimp.tolist())))

    # ---- actuators -----------------------------------------------------------
    act_names: Dict[str, int] = {}
    acts = []
    # ---- heightfield asset (at most one; quadruped escape) ------------------
    hfield_nrow = hfield_ncol = 0
    hfield_size = None
    hfield_pos = np.zeros(3)
    asset_el = root.find('asset')
    if asset_el is not None:
        for ael in asset_el:
            if ael.tag == 'hfield':
                hfield_nrow = int(ael.attrib.get('nrow', 0))
                hfield_ncol = int(ael.attrib.get('ncol', 0))
                hfield_size = _floats(ael.attrib['size'])
    if hfield_nrow:
        for g in b.geoms:
            if g['type'] == M.HFIELD:
                hfield_pos = np.asarray(g['pos'])

    # ---- explicit contact excludes ------------------------------------------
    contact_excludes = []
    contact_el = root.find('contact')
    if contact_el is not None:
        for cel in contact_el:
            if cel.tag == 'exclude':
                contact_excludes.append(
                    (b.body_names[cel.attrib['body1']],
                     b.body_names[cel.attrib['body2']]))
    contact_excludes = tuple(contact_excludes)

    actuator_el = root.find('actuator')
    if actuator_el is not None:
        for ael in actuator_el:
            tag = ael.tag
            attrs = defaults.resolve(tag, ael.attrib,
                                     ael.attrib.get('class'))
            if tag not in ('motor', 'position', 'velocity', 'general'):
                continue
            gear_in = _floats(attrs.get('gear', '1'))
            gear = float(gear_in[0])
            ctrllimited = attrs.get('ctrllimited', 'false') in ('true', '1')
            ctrlrange = (_floats(attrs['ctrlrange']) if 'ctrlrange' in attrs
                         else np.zeros(2))
            forcelimited = attrs.get('forcelimited', 'false') in ('true', '1')
            forcerange = (_floats(attrs['forcerange'])
                          if 'forcerange' in attrs else np.zeros(2))
            if 'joint' in attrs:
                trntype, trnid = M.TRN_JOINT, b.jnt_names[attrs['joint']]
            elif 'tendon' in attrs:
                trntype, trnid = M.TRN_TENDON, tendon_names[attrs['tendon']]
            else:
                raise ValueError(f'actuator {attrs} needs joint or tendon')
            gainprm = np.array([1.0, 0.0, 0.0])
            biasprm = np.zeros(3)
            biastype = M.BIAS_NONE
            if tag == 'position':
                kp = float(attrs.get('kp', 1.0))
                gainprm[0] = kp
                biasprm = np.array([0.0, -kp, 0.0])
                biastype = M.BIAS_AFFINE
            elif tag == 'velocity':
                kv = float(attrs.get('kv', 1.0))
                gainprm[0] = kv
                biasprm = np.array([0.0, 0.0, -kv])
                biastype = M.BIAS_AFFINE
            elif tag == 'general':
                if 'gainprm' in attrs:
                    gp = _floats(attrs['gainprm'])
                    gainprm[:len(gp[:3])] = gp[:3]
                if 'biasprm' in attrs:
                    bp = _floats(attrs['biasprm'])
                    biasprm[:len(bp[:3])] = bp[:3]
                    biastype = M.BIAS_AFFINE
            # activation dynamics (quadruped: dyntype="filter" dynprm=".1")
            dyntype = {'none': M.DYN_NONE, 'integrator': M.DYN_INTEGRATOR,
                       'filter': M.DYN_FILTER}[attrs.get('dyntype', 'none')]
            dynprm = np.array([1.0, 0.0, 0.0])
            if 'dynprm' in attrs:
                dp = _floats(attrs['dynprm'])
                dynprm[:len(dp[:3])] = dp[:3]
            name = attrs.get('name')
            if name:
                act_names[name] = len(acts)
            acts.append(dict(trntype=trntype, trnid=trnid, gear=gear,
                             ctrllimited=ctrllimited, ctrlrange=ctrlrange,
                             forcelimited=forcelimited, forcerange=forcerange,
                             gainprm=gainprm, biasprm=biasprm,
                             biastype=biastype, dyntype=dyntype,
                             dynprm=dynprm))
    nu = len(acts)

    # activation state addressing: one slot per stateful actuator
    actadr = []
    na = 0
    for a in acts:
        if a['dyntype'] != M.DYN_NONE:
            actadr.append(na)
            na += 1
        else:
            actadr.append(-1)

    import jax.numpy as jnp

    # ---- fluid-model equivalent inertia boxes ------------------------------
    # principal inertia via eigendecomposition; box half-size
    # a_i = sqrt(3*(I_j + I_k - I_i) / (2*m)) (MuJoCo inertia-box model)
    body_fluid_box = np.zeros((nbody, 3))
    body_principal_mat = np.tile(np.eye(3), (nbody, 1, 1))
    for i in range(nbody):
        mm = body_mass[i]
        if mm > 1e-12:
            evals, evecs = np.linalg.eigh(body_inertia[i])
            body_principal_mat[i] = evecs
            for ax in range(3):
                j, k = (ax + 1) % 3, (ax + 2) % 3
                val = 3.0 * max(evals[j] + evals[k] - evals[ax], 1e-14) / \
                    (2.0 * mm)
                body_fluid_box[i, ax] = np.sqrt(val)

    def arr(x, shape=None):
        a = np.asarray(x, dtype=dtype)
        if shape is not None and a.size == 0:
            a = a.reshape(shape)
        return jnp.asarray(a)

    names = {'body': b.body_names, 'joint': b.jnt_names,
             'geom': b.geom_names, 'site': b.site_names,
             'actuator': act_names, 'tendon': tendon_names,
             'camera': b.camera_names}

    model = M.Model(
        opt=M.Option(
            timestep=arr(timestep), gravity=arr(gravity),
            viscosity=arr(viscosity), density=arr(density), wind=arr(wind),
            integrator=integrator, disableflags=disableflags,
            cone=cone, impratio=impratio,
            solver_iterations=solver_iterations,
            # APGD (dense batched matvecs, MXU-friendly) is the default
            # everywhere. Round 1 fell back to row-sweep PGS on elliptic
            # models (SOC blocks + stiff tendon-equality rows stalled
            # first-order projection); with per-substep warm starting
            # (Option.solver_warmstart) APGD passes the calibrated
            # dm_control parity thresholds on those domains too
            # (finger/manipulator parity + conformance, tests/
            # test_parity_physics.py). PGS remains selectable per model
            # for cross-validation.
            solver='apgd'),
        nq=nq, nv=nv, nu=nu, nbody=nbody, njnt=njnt,
        ngeom=len(b.geoms), nsite=len(b.sites), ntendon=ntendon,
        body_parent=tuple(b.body_parent),
        jnt_type=tuple(j['type'] for j in b.jnt),
        jnt_body=tuple(j['body'] for j in b.jnt),
        jnt_qposadr=tuple(jnt_qposadr),
        jnt_dofadr=tuple(jnt_dofadr),
        jnt_limited=tuple(bool(j['limited']) for j in b.jnt),
        dof_jnt=tuple(dof_jnt),
        geom_type=tuple(g['type'] for g in b.geoms),
        geom_body=tuple(g['body'] for g in b.geoms),
        site_body=tuple(s['body'] for s in b.sites),
        actuator_trntype=tuple(a['trntype'] for a in acts),
        actuator_trnid=tuple(a['trnid'] for a in acts),
        actuator_ctrllimited=tuple(a['ctrllimited'] for a in acts),
        names=names,
        body_pos=arr(b.body_pos, (nbody, 3)),
        body_quat=arr(b.body_quat, (nbody, 4)),
        body_mass=arr(body_mass),
        body_ipos=arr(body_ipos),
        body_inertia=arr(body_inertia),
        jnt_pos=arr([j['pos'] for j in b.jnt], (njnt, 3)),
        jnt_axis=arr([j['axis'] / np.linalg.norm(j['axis'])
                      for j in b.jnt], (njnt, 3)),
        jnt_range=arr([j['range'] for j in b.jnt], (njnt, 2)),
        jnt_solref=arr([j['solref'] for j in b.jnt], (njnt, 2)),
        jnt_solimp=arr([j['solimp'] for j in b.jnt], (njnt, 5)),
        jnt_stiffness=arr([j['stiffness'] for j in b.jnt], (njnt,)),
        jnt_margin=arr([j['margin'] for j in b.jnt], (njnt,)),
        dof_damping=arr(dof_damping, (nv,)),
        dof_armature=arr(dof_armature, (nv,)),
        dof_frictionloss=arr(dof_frictionloss, (nv,)),
        geom_pos=arr([g['pos'] for g in b.geoms], (len(b.geoms), 3)),
        geom_quat=arr([g['quat'] for g in b.geoms], (len(b.geoms), 4)),
        geom_size=arr([g['size'] for g in b.geoms], (len(b.geoms), 3)),
        geom_friction=arr([g['friction'] for g in b.geoms],
                          (len(b.geoms), 3)),
        geom_solref=arr([g['solref'] for g in b.geoms], (len(b.geoms), 2)),
        geom_solimp=arr([g['solimp'] for g in b.geoms], (len(b.geoms), 5)),
        geom_margin=arr([g['margin'] for g in b.geoms], (len(b.geoms),)),
        geom_contype=tuple(g['contype'] for g in b.geoms),
        geom_conaffinity=tuple(g['conaffinity'] for g in b.geoms),
        geom_condim=tuple(g['condim'] for g in b.geoms),
        geom_priority=tuple(g['priority'] for g in b.geoms),
        geom_solmix=arr([g['solmix'] for g in b.geoms], (len(b.geoms),)),
        site_pos=arr([s['pos'] for s in b.sites], (len(b.sites), 3)),
        site_quat=arr([s['quat'] for s in b.sites], (len(b.sites), 4)),
        site_type=tuple(s['type'] for s in b.sites),
        site_size=arr([s['size'] for s in b.sites], (len(b.sites), 3)),
        tendon_moment=arr(tendon_moment, (ntendon, nv)),
        tendon_stiffness=arr(tendon_stiffness, (ntendon,)),
        tendon_damping=arr(tendon_damping, (ntendon,)),
        tendon_jnt=tuple(tendon_jnt),
        spatial_tendons=tuple(spatial_tendons),
        eq_tendon=tuple(eq_tendon),
        actuator_gear=arr([a['gear'] for a in acts], (nu,)),
        actuator_ctrlrange=arr([a['ctrlrange'] for a in acts], (nu, 2)),
        actuator_gainprm=arr([a['gainprm'] for a in acts], (nu, 3)),
        actuator_biasprm=arr([a['biasprm'] for a in acts], (nu, 3)),
        actuator_forcerange=arr([a['forcerange'] for a in acts], (nu, 2)),
        actuator_forcelimited=tuple(a['forcelimited'] for a in acts),
        actuator_biastype=tuple(a['biastype'] for a in acts),
        body_fluid_box=arr(body_fluid_box),
        body_principal_mat=arr(body_principal_mat),
        qpos0=arr(qpos0),
        qpos_spring=arr(qpos_spring),
        na=na,
        actuator_dyntype=tuple(a['dyntype'] for a in acts),
        actuator_actadr=tuple(actadr),
        actuator_dynprm=arr([a['dynprm'] for a in acts], shape=(0, 3)),
        contact_excludes=contact_excludes,
        ncam=len(b.cameras),
        cam_body=tuple(c['body'] for c in b.cameras),
        cam_mode=tuple(c['mode'] for c in b.cameras),
        cam_fovy=tuple(c['fovy'] for c in b.cameras),
        cam_pos=arr([c['pos'] for c in b.cameras], (len(b.cameras), 3)),
        cam_quat=arr([c['quat'] for c in b.cameras], (len(b.cameras), 4)),
        hfield_nrow=hfield_nrow, hfield_ncol=hfield_ncol,
        hfield_data=(jnp.zeros((hfield_nrow, hfield_ncol), dtype)
                     if hfield_nrow else None),
        hfield_size=(arr(hfield_size) if hfield_size is not None
                     else None),
        hfield_pos=(arr(hfield_pos) if hfield_nrow else None),
    )
    return _with_invweight0(model)


def _with_invweight0(model: 'M.Model') -> 'M.Model':
    """Fill dof/body/tendon_invweight0 constants computed at qpos0.

    mj_setConst semantics: with M the joint-space inertia at the reference
    configuration, dof_invweight0 = diag(M^-1); body_invweight0[b] is the
    mean diagonal of the translational (resp. rotational) block of
    J_com M^-1 J_com' at the body CoM; tendon_invweight0 = r M^-1 r' for
    the tendon's moment row. Verified against mjModel.*_invweight0 by
    tests/test_parity_model.py.
    """
    import jax.numpy as jnp
    import numpy as np
    from . import smooth
    from .solver import ancestor_dof_mask

    nv, nbody = model.nv, model.nbody
    if nv == 0:
        return model
    meta = smooth.tree_meta(model)
    qpos0 = jnp.asarray(model.qpos0)

    # One jitted probe instead of eager op-by-op execution: every eager
    # jnp primitive compiles its own tiny XLA program (~120 programs for
    # even a 2-dof model), which dominated suite.load() wall time
    # (cartpole: ~55 s of eager compiles on a 1-core host; one fused
    # program compiles in ~1 s and scales fine to humanoid_cmu).
    import jax

    def _probe(q0):
        (xpos, xquat, _xmat, _gxp, _gxm, sxp,
         xanchor, xaxis) = smooth.kinematics(model, q0, meta)
        xipos = smooth.com_positions(model, xpos, xquat)
        cdof = smooth.motion_subspace(model, xquat, xanchor, xaxis, meta)
        cinert = smooth.body_spatial_inertia(model, xquat, xipos)
        qM = smooth.crba(model, cdof, cinert, meta)
        return sxp, xipos, cdof, qM

    _sxp, xipos, cdof, qM = jax.jit(_probe)(qpos0)
    qM = np.asarray(qM, np.float64)
    Minv = np.linalg.inv(qM)

    dof_iw = np.diag(Minv).copy()
    # free/ball joints: MuJoCo assigns each 3-dof translation/rotation
    # group the group MEAN of diag(M^-1) (probed vs mjModel.dof_invweight0)
    for j in range(model.njnt):
        adr = model.jnt_dofadr[j]
        if model.jnt_type[j] == M.FREE:
            dof_iw[adr:adr + 3] = dof_iw[adr:adr + 3].mean()
            dof_iw[adr + 3:adr + 6] = dof_iw[adr + 3:adr + 6].mean()
        elif model.jnt_type[j] == M.BALL:
            dof_iw[adr:adr + 3] = dof_iw[adr:adr + 3].mean()

    amask = np.asarray(ancestor_dof_mask(model, meta), np.float64)
    cdof_np = np.asarray(cdof, np.float64)
    xipos_np = np.asarray(xipos, np.float64)
    body_ipos_np = np.asarray(model.body_ipos, np.float64)
    body_mass_np = np.asarray(model.body_mass, np.float64)
    jnt_axis_np = np.asarray(model.jnt_axis, np.float64)
    has_child = set(model.body_parent[1:])

    def _simple2(bb):
        """MuJoCo 'simple body, sliders only' fast path: axis-aligned
        slide-only leaf body hanging off the world with CoM at the body
        origin gets invweight 1/mass instead of trace(A)/3 (probed against
        mjModel.body_simple / body_invweight0 — ball_in_cup ball,
        point_mass, lqr masses)."""
        joints = [j for j in range(model.njnt) if model.jnt_body[j] == bb]
        if not joints or bb in has_child or model.body_parent[bb] != 0:
            return False
        for j in joints:
            if model.jnt_type[j] != M.SLIDE:
                return False
            if np.count_nonzero(np.abs(jnt_axis_np[j]) > 1e-12) != 1:
                return False
        return bool(np.all(np.abs(body_ipos_np[bb]) < 1e-12))

    has_free = {model.jnt_body[j] for j in range(model.njnt)
                if model.jnt_type[j] == M.FREE}
    body_iw = np.zeros((nbody, 2))
    for bb in range(1, nbody):
        if _simple2(bb) and body_mass_np[bb] > 0:
            body_iw[bb] = (1.0 / body_mass_np[bb], 0.0)
            continue
        mask = amask[bb][:, None]
        Jt = (cdof_np[:, 3:]
              + np.cross(cdof_np[:, :3], xipos_np[bb][None, :])) * mask
        Jr = cdof_np[:, :3] * mask
        At = Jt.T @ Minv @ Jt
        Ar = Jr.T @ Minv @ Jr
        iw_t = np.trace(At) / 3.0
        # free-joint LEAF bodies take the exact 1/mass translational weight
        # (probed: mjModel gives 1/m even with CoM offset from the frame;
        # free bodies with children keep the trace/3 form)
        if bb in has_free and bb not in has_child and body_mass_np[bb] > 0:
            iw_t = 1.0 / body_mass_np[bb]
        body_iw[bb] = (iw_t, np.trace(Ar) / 3.0)

    ten_iw = np.zeros((model.ntendon,))
    ten_moment = np.asarray(model.tendon_moment, np.float64)
    for t in range(model.ntendon):
        r = ten_moment[t]
        ten_iw[t] = r @ Minv @ r

    # spatial tendons (ball_in_cup string): moment row at qpos0 for the
    # limit row's invweight; entries extend to (s1, s2, limited, lo, hi, iw)
    site_xpos_np = None
    new_spatial = []
    for entry in model.spatial_tendons:
        s1, s2, limited, lo, hi = entry[:5]
        if site_xpos_np is None:
            site_xpos_np = np.asarray(_sxp, np.float64)
        diff = site_xpos_np[s1] - site_xpos_np[s2]
        u = diff / max(np.linalg.norm(diff), 1e-9)
        row = np.zeros(nv)
        for (bb, pp, sgn) in ((model.site_body[s1], site_xpos_np[s1], 1.0),
                              (model.site_body[s2], site_xpos_np[s2], -1.0)):
            for k in range(nv):
                if amask[bb, k]:
                    v = cdof_np[k, 3:] + np.cross(cdof_np[k, :3], pp)
                    row[k] += sgn * (u @ v)
        new_spatial.append((s1, s2, limited, lo, hi,
                            float(row @ Minv @ row)))

    dtype = model.qpos0.dtype
    return model.replace(
        dof_invweight0=jnp.asarray(dof_iw, dtype),
        body_invweight0=jnp.asarray(body_iw, dtype),
        tendon_invweight0=jnp.asarray(ten_iw, dtype),
        spatial_tendons=tuple(new_spatial))
