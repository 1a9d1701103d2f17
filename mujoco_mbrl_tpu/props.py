"""Reusable prop entities: primitives and a position detector.

Composer-lite analogue of the reference's entity/prop library
(``dm_control/entities/props/primitive.py:28-112`` and
``position_detector.py:45-262``): a :class:`Primitive` is a single
free-floating geom exposing pose/velocity observables; a
:class:`PositionDetector` is an axis-aligned box region that reports
which registered entities are inside it.

Both are pure re-designs: the reference mutates geom colors and caches
detection state in ``after_substep``; here detection is a jittable pure
function of ``(model, data)`` so it can run inside vmapped env batches,
and the per-step detection flags are exposed as observables instead of
render-side color changes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from . import composer
from .physics import builder

_GEOM_SIZES = {  # geom_type -> number of size parameters (MJCF spec)
    'sphere': 1, 'capsule': 2, 'cylinder': 2, 'ellipsoid': 3, 'box': 3,
}


class Primitive(composer.Entity):
    """A single free-floating primitive geom (primitive.py:28).

    Observables mirror ``PrimitiveObservables`` (primitive.py:94-112):
    position, orientation (quaternion), linear and angular velocity.
    """

    def _build(self, geom_type: str = 'sphere',
               size: Sequence[float] = (0.05,),
               rgba: Sequence[float] = (0.5, 0.5, 0.5, 1.0),
               pos: Sequence[float] = (0.0, 0.0, 0.0),
               mass: Optional[float] = None,
               friction: Optional[Sequence[float]] = None,
               name: str = 'prop'):
        if geom_type not in _GEOM_SIZES:
            raise ValueError(f'unsupported primitive geom type {geom_type!r}')
        if len(size) != _GEOM_SIZES[geom_type]:
            raise ValueError(
                f'{geom_type} takes {_GEOM_SIZES[geom_type]} size '
                f'parameters, got {len(size)}')
        self._body_name = name
        root = builder.RootElement(model=name)
        body = root.worldbody.add('body', name=name, pos=list(pos))
        body.add('joint', name=f'{name}_root', type='free', limited=False)
        geom_attrs = dict(name=name, type=geom_type, size=list(size),
                          rgba=list(rgba))
        if mass is not None:
            geom_attrs['mass'] = mass
        if friction is not None:
            geom_attrs['friction'] = list(friction)
        body.add('geom', **geom_attrs)
        return root

    # -- static index helpers (trace-time constants) ---------------------
    def body_id(self, model) -> int:
        return model.names['body'][self.name(self._body_name)]

    def joint_qposadr(self, model) -> int:
        j = model.names['joint'][self.name(f'{self._body_name}_root')]
        return int(model.jnt_qposadr[j])

    def set_pose(self, model, qpos, pos=None, quat=None):
        """Functionally write this prop's free-joint pose into qpos."""
        adr = self.joint_qposadr(model)
        if pos is not None:
            qpos = qpos.at[adr:adr + 3].set(jnp.asarray(pos, qpos.dtype))
        if quat is not None:
            qpos = qpos.at[adr + 3:adr + 7].set(
                jnp.asarray(quat, qpos.dtype))
        return qpos

    # -- observables (primitive.py:94-112) -------------------------------
    @composer.observable
    def position(self, model, phys, data):
        return data.xpos[self.body_id(model)]

    @composer.observable
    def orientation(self, model, phys, data):
        return data.xquat[self.body_id(model)]

    @composer.observable
    def linear_velocity(self, model, phys, data):
        b = self.body_id(model)
        # cvel is a world-origin spatial velocity; velocity of the body
        # CoM point p is lin + ang x p (same convention as
        # suite.sensors.subtree_linvel)
        return data.cvel[b, 3:] + jnp.cross(data.cvel[b, :3],
                                            data.xipos[b])

    @composer.observable
    def angular_velocity(self, model, phys, data):
        return data.cvel[self.body_id(model), :3]


class PositionDetector(composer.Entity):
    """Axis-aligned box region reporting registered entities inside it
    (position_detector.py:45).

    The reference detects in 2 or 3 dimensions depending on ``len(size)``
    and supports ``inverted`` (detect while *outside*); both semantics are
    kept. Detection is evaluated against the detector site's runtime
    position, so an attached/offset detector zone moves with its frame.

    Use :meth:`detections` inside observables/rewards — it is a pure
    function of ``(model, data)`` returning one flag per registered
    entity — or read the ``detected`` observable this entity exposes.
    """

    def _build(self, pos: Sequence[float], size: Sequence[float],
               inverted: bool = False,
               rgba: Sequence[float] = (1, 0, 0, 0.25),
               name: str = 'detector'):
        if not 2 <= len(size) <= 3:
            raise ValueError('size must have 2 (planar) or 3 entries')
        self._site_name = name
        self._size = np.asarray(size, np.float64)
        self._dims = len(size)
        self._inverted = bool(inverted)
        self._registered = []
        root = builder.RootElement(model=name)
        pos3 = list(pos) + [0.0] * (3 - len(pos)) if len(pos) < 3 \
            else list(pos)
        root.worldbody.add('site', name=name, pos=pos3, rgba=list(rgba))
        return root

    # -- registration (position_detector.py:194-206) ---------------------
    def register_entities(self, *entities: Primitive) -> None:
        self._registered.extend(entities)

    def deregister_entities(self) -> None:
        self._registered = []

    @property
    def registered_entities(self):
        return tuple(self._registered)

    # -- detection --------------------------------------------------------
    def site_id(self, model) -> int:
        return model.names['site'][self.name(self._site_name)]

    def zone(self, model, data):
        """(lower, upper) corners of the detection box, world frame."""
        mid = data.site_xpos[self.site_id(model)][:self._dims]
        half = jnp.asarray(self._size[:self._dims], mid.dtype)
        return mid - half, mid + half

    def detections(self, model, data) -> jnp.ndarray:
        """Boolean flag per registered entity: inside the zone
        (position_detector.py:220-238's _update_detection, as a pure fn).
        """
        if not self._registered:
            return jnp.zeros((0,), bool)
        lower, upper = self.zone(model, data)
        flags = []
        for e in self._registered:
            p = data.xpos[e.body_id(model)][:self._dims]
            inside = jnp.logical_and(p >= lower, p <= upper).all()
            flags.append(jnp.logical_xor(inside, self._inverted))
        return jnp.stack(flags)

    def activated(self, model, data) -> jnp.ndarray:
        """True when any registered entity is detected."""
        return self.detections(model, data).any()

    @composer.observable
    def detected(self, model, phys, data):
        return self.detections(model, data).astype(jnp.float32)
