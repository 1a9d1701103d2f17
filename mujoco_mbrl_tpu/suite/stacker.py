"""Planar stacker domain: stack_2 / stack_4.

Task contract from the reference
(``dm_control/dm_control/suite/stacker.py``); the arena/arm model is
shared with the manipulator domain (identical in the reference XMLs) with
box props. Exercises the box-box / capsule-box contact kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..physics import collision, make_state, mjcf, smooth
from . import base, control, rewards, sensors
from .manipulator import _ARM_JOINTS, _make_model_xml
from .registry import TaggedTasks

SUITE = TaggedTasks()
_CLOSE = .01
_CONTROL_TIMESTEP = .01
_TIME_LIMIT = 10
_BOX_SIZE = .022


def _box_xml(b: int, x: float) -> str:
    return f"""
    <body name='box{b}' pos='{x} 0 .4' childclass='object'>
      <joint name='box{b}_x' type='slide' axis='1 0 0' ref='{x}'/>
      <joint name='box{b}_z' type='slide' axis='0 0 1' ref='.4'/>
      <joint name='box{b}_y' type='hinge' axis='0 1 0'/>
      <geom name='box{b}' type='box' size='.022 .022 .022'/>
      <site name='box{b}' type='sphere'/>
    </body>"""


def _props_xml(n_boxes: int) -> str:
    boxes = ''.join(_box_xml(b, x)
                    for b, x in zip(range(n_boxes), (.5, .4, .3, .2)))
    return boxes + """
    <body name='target' pos='0 .001 .022' childclass='ghost'>
      <geom name='target' type='box' size='.022 .022 .022'/>
      <site name='target' type='sphere'/>
    </body>"""


class Stack(base.Task):
    """Stack the boxes on the target location (stacker.py Stack)."""

    _INIT_ATTEMPTS = 8
    _TOUCH_SITES = ['palm_touch', 'finger_touch', 'thumb_touch',
                    'fingertip_touch', 'thumbtip_touch']
    _TOUCH_GEOMS = ['palm1', 'finger1', 'thumb1', 'fingertip1', 'thumbtip1']

    def __init__(self, n_boxes: int, fully_observable: bool):
        self._n_boxes = n_boxes
        self._box_names = [f'box{b}' for b in range(n_boxes)]
        # observation order is x, y(hinge), z per box (stacker.py:136-139)
        self._box_joints = [f'{n}_{d}' for n in self._box_names
                            for d in 'xyz']
        self._fully_observable = fully_observable

    # -- episode init -------------------------------------------------------
    def initialize_episode(self, model, key):
        """Random arm pose, random box placements, random target column
        height, with fixed-attempt collision rejection
        (stacker.py:143-182, SPMD-safe)."""
        meta = smooth.tree_meta(model)
        pairs = collision.candidate_pairs(model, include_geom_geom=True)
        jadr = {j: model.jnt_qposadr[model.names['joint'][j]]
                for j in (_ARM_JOINTS + self._box_joints)}

        def try_one(k):
            n_arm = len(_ARM_JOINTS)
            ks = jax.random.split(k, n_arm + 3 + 3 * self._n_boxes)
            qpos = jnp.asarray(model.qpos0)
            for i, j in enumerate(_ARM_JOINTS):
                ji = model.names['joint'][j]
                limited = model.jnt_limited[ji]
                lo = model.jnt_range[ji, 0] if limited else -np.pi
                hi = model.jnt_range[ji, 1] if limited else np.pi
                qpos = qpos.at[jadr[j]].set(
                    jax.random.uniform(ks[i], (), minval=lo, maxval=hi))
            qpos = qpos.at[jadr['finger']].set(qpos[jadr['thumb']])
            # target column: height = box_size * (2*randint(n)+1)
            kt_h, kt_x = ks[n_arm], ks[n_arm + 1]
            level = jax.random.randint(kt_h, (), 0, self._n_boxes)
            target_z = _BOX_SIZE * (2 * level + 1).astype(jnp.float32)
            target_x = jax.random.uniform(kt_x, (), minval=-.37,
                                          maxval=.37)
            for b, name in enumerate(self._box_names):
                kx, kz, ka = ks[n_arm + 2 + 3 * b: n_arm + 5 + 3 * b]
                qpos = qpos.at[jadr[f'{name}_x']].set(
                    jax.random.uniform(kx, (), minval=.1, maxval=.3))
                qpos = qpos.at[jadr[f'{name}_z']].set(
                    jax.random.uniform(kz, (), minval=0., maxval=.7))
                qpos = qpos.at[jadr[f'{name}_y']].set(
                    jax.random.uniform(ka, (), minval=0.,
                                       maxval=2 * np.pi))
            (xpos, xquat, xmat, geom_xpos, geom_xmat, *_
             ) = smooth.kinematics(model, qpos, meta)
            contact = collision.detect(model, geom_xpos, geom_xmat, pairs)
            params = jnp.stack([target_x, target_z])
            return qpos, params, (contact.dist < 0).any()

        keys = jax.random.split(key, self._INIT_ATTEMPTS)
        qposes, params, penet = jax.vmap(try_one)(keys)
        ok = jnp.logical_not(penet)
        idx = jnp.where(ok.any(), jnp.argmax(ok), 0)
        return make_state(model, qpos=qposes[idx]), params[idx]

    def apply_params(self, model, params):
        tid = model.name2id('body', 'target')
        body_pos = model.body_pos.at[tid, 0].set(params[0])
        body_pos = body_pos.at[tid, 2].set(params[1])
        return model.replace(body_pos=body_pos)

    # -- observations (stacker.py:185-196) -----------------------------------
    def _bounded_joint_pos(self, model, phys):
        vals = []
        for j in _ARM_JOINTS:
            q = phys.qpos[model.jnt_qposadr[model.names['joint'][j]]]
            vals.append(jnp.stack([jnp.sin(q), jnp.cos(q)]))
        return jnp.stack(vals)

    def _joint_vel(self, model, phys, names):
        return jnp.stack([phys.qvel[model.jnt_dofadr[
            model.names['joint'][j]]] for j in names])

    def _touch(self, model, data):
        out = []
        for site, geom in zip(self._TOUCH_SITES, self._TOUCH_GEOMS):
            out.append(sensors.touch(
                model, data, model.name2id('site', site),
                model.name2id('geom', geom), radius=0.05))
        return jnp.log1p(jnp.stack(out))

    def _body_2d_pose(self, model, data, body_name, orientation=True):
        b = model.name2id('body', body_name)
        pos = data.xpos[b][jnp.array([0, 2])]
        if not orientation:
            return pos
        return jnp.concatenate([pos, data.xquat[b][jnp.array([0, 2])]])

    def get_observation(self, model, phys, data):
        obs = {
            'arm_pos': self._bounded_joint_pos(model, phys),
            'arm_vel': self._joint_vel(model, phys, _ARM_JOINTS),
            'touch': self._touch(model, data),
        }
        if self._fully_observable:
            obs['hand_pos'] = self._body_2d_pose(model, data, 'hand')
            obs['box_pos'] = jnp.stack(
                [self._body_2d_pose(model, data, n)
                 for n in self._box_names])
            obs['box_vel'] = self._joint_vel(model, phys,
                                             self._box_joints)
            obs['target_pos'] = self._body_2d_pose(
                model, data, 'target', orientation=False)
        return obs

    # -- reward (stacker.py:198-208) ------------------------------------------
    def _site_distance(self, model, data, s1, s2):
        p1 = data.site_xpos[model.name2id('site', s1)]
        p2 = data.site_xpos[model.name2id('site', s2)]
        return jnp.linalg.norm(p1 - p2)

    def get_reward(self, model, phys, data, ctrl):
        box_dists = jnp.stack(
            [self._site_distance(model, data, n, 'target')
             for n in self._box_names])
        box_is_close = rewards.tolerance(jnp.min(box_dists),
                                         margin=2 * _BOX_SIZE)
        hand_to_target = self._site_distance(model, data, 'grasp',
                                             'target')
        hand_is_far = rewards.tolerance(hand_to_target,
                                        bounds=(.1, float('inf')),
                                        margin=_CLOSE)
        return box_is_close * hand_is_far


def _env(n_boxes, fully_observable, time_limit, environment_kwargs):
    model = mjcf.parse(_make_model_xml(props=_props_xml(n_boxes),
                                       geom_solref='.01 1'))
    model = model.replace(opt=model.opt.replace(
        enable_geom_geom_contacts=True))
    task = Stack(n_boxes=n_boxes, fully_observable=fully_observable)
    kwargs = dict(environment_kwargs or {})
    kwargs.setdefault('control_timestep', _CONTROL_TIMESTEP)
    return control.Environment(model, task, time_limit=time_limit,
                               **kwargs)


@SUITE.add('hard')
def stack_2(fully_observable=True, time_limit=_TIME_LIMIT,
            environment_kwargs=None):
    return _env(2, fully_observable, time_limit, environment_kwargs)


@SUITE.add('hard')
def stack_4(fully_observable=True, time_limit=_TIME_LIMIT,
            environment_kwargs=None):
    return _env(4, fully_observable, time_limit, environment_kwargs)
