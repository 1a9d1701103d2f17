"""Planar manipulator domain: bring_ball / bring_peg / insert_ball /
insert_peg.

Task contract from the reference
(``dm_control/dm_control/suite/manipulator.py``); model constants
transcribed from its ``manipulator.xml``. Prop selection (ball vs peg,
receptacle inclusion) happens at model-generation time like the
reference's make_model.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..physics import collision, make_state, mjcf, smooth
from . import base, control, rewards, sensors
from .registry import TaggedTasks

SUITE = TaggedTasks()
_CLOSE = .01
_CONTROL_TIMESTEP = .01
_TIME_LIMIT = 10
_P_IN_HAND = .1
_P_IN_TARGET = .1
_ARM_JOINTS = ['arm_root', 'arm_shoulder', 'arm_elbow', 'arm_wrist',
               'finger', 'fingertip', 'thumb', 'thumbtip']

_BALL = """
    <body name='ball' pos='.4 0 .4' childclass='object'>
      <joint name='ball_x' type='slide' axis='1 0 0' ref='.4'/>
      <joint name='ball_z' type='slide' axis='0 0 1' ref='.4'/>
      <joint name='ball_y' type='hinge' axis='0 1 0'/>
      <geom name='ball' type='sphere' size='.022'/>
      <site name='ball' type='sphere'/>
    </body>
    <body name='target_ball' pos='.4 .001 .4' childclass='ghost'>
      <geom name='target_ball' type='sphere' size='.02'/>
      <site name='target_ball' type='sphere'/>
    </body>
"""
_PEG = """
    <body name='peg' pos='-.4 0 .4' childclass='object'>
      <joint name='peg_x' type='slide' axis='1 0 0' ref='-.4'/>
      <joint name='peg_z' type='slide' axis='0 0 1' ref='.4'/>
      <joint name='peg_y' type='hinge' axis='0 1 0'/>
      <geom name='blade' type='capsule' size='.005'
            fromto='0 0 -.013 0 0 -.113'/>
      <geom name='guard' type='capsule' size='.005'
            fromto='-.017 0 -.043 .017 0 -.043'/>
      <body name='pommel' pos='0 0 -.013'>
        <geom name='pommel' type='sphere' size='.009'/>
      </body>
      <site name='peg' type='box' pos='0 0 -.063'/>
      <site name='peg_pinch' type='box' pos='0 0 -.025'/>
      <site name='peg_grasp' type='box' pos='0 0 0'/>
      <site name='peg_tip' type='box' pos='0 0 -.113'/>
    </body>
    <body name='target_peg' pos='-.2 .001 .4' childclass='ghost'>
      <geom name='target_blade' type='capsule' size='.005'
            fromto='0 0 -.013 0 0 -.113'/>
      <geom name='target_guard' type='capsule' size='.005'
            fromto='-.017 0 -.043 .017 0 -.043'/>
      <geom name='target_pommel' type='sphere' size='.009' pos='0 0 -.013'/>
      <site name='target_peg' type='box' pos='0 0 -.063'/>
      <site name='target_peg_pinch' type='box' pos='0 0 -.025'/>
      <site name='target_peg_grasp' type='box' pos='0 0 0'/>
      <site name='target_peg_tip' type='box' pos='0 0 -.113'/>
    </body>
"""
_SLOT = """
    <body name='slot' pos='-.405 0 .2' euler='0 20 0' childclass='obstacle'>
      <geom name='slot_0' type='box' pos='-.0252 0 -.083'
            size='.0198 .01 .035'/>
      <geom name='slot_1' type='box' pos='.0252 0 -.083'
            size='.0198 .01 .035'/>
      <geom name='slot_2' type='box' pos='0 0 -.138' size='.045 .01 .02'/>
      <site name='slot' type='box'/>
      <site name='slot_end' type='box' pos='0 0 -.05'/>
    </body>
"""
_CUP = """
    <body name='cup' pos='.3 0 .4' euler='0 -15 0' childclass='obstacle'>
      <geom name='cup_0' type='capsule' size='.008'
            fromto='-.03 0 .06 -.03 0 -.015'/>
      <geom name='cup_1' type='capsule' size='.008'
            fromto='-.03 0 -.015 0 0 -.04'/>
      <geom name='cup_2' type='capsule' size='.008'
            fromto='0 0 -.04 .03 0 -.015'/>
      <geom name='cup_3' type='capsule' size='.008'
            fromto='.03 0 -.015 .03 0 .06'/>
      <site name='cup' size='.005'/>
    </body>
"""


def _make_model_xml(use_peg: bool = False, insert: bool = False,
                    props: str = None, geom_solref: str = '.005 1') -> str:
    """Arena + arm + hand model; `props` overrides the prop bodies so the
    stacker domain (same arm, boxes for props, default geom solref .01 per
    stacker.xml:19) shares this template."""
    if props is None:
        props = _PEG if use_peg else _BALL
        if insert:
            props += _SLOT if use_peg else _CUP
    return f"""
<mujoco model='planar manipulator'>
  <option timestep='0.001' cone='elliptic'/>
  <default>
    <geom friction='.7' solimp='0.9 0.97 0.001' solref='{geom_solref}'/>
    <joint solimplimit='0 0.99 0.01' solreflimit='.005 1'/>
    <site size='.003 .003 .003'/>
    <default class='arm'>
      <geom type='capsule' density='500'/>
      <joint type='hinge' pos='0 0 0' axis='0 -1 0' limited='true'/>
      <default class='hand'>
        <joint damping='.5' range='-10 60'/>
        <geom size='.008'/>
        <site type='box' size='.018 .005 .005' pos='.022 0 -.002'
              euler='0 15 0'/>
        <default class='fingertip'>
          <geom type='sphere' size='.008'/>
          <joint damping='.01' stiffness='.01' range='-40 20'/>
          <site size='.012 .005 .008' pos='.003 0 .003' euler='0 0 0'/>
        </default>
      </default>
    </default>
    <default class='object'><geom/></default>
    <default class='obstacle'><geom friction='0'/></default>
    <default class='ghost'><geom contype='0' conaffinity='0'/></default>
  </default>
  <worldbody>
    <geom name='floor' type='plane' pos='0 0 0' size='.4 .2 10'/>
    <geom name='wall1' type='plane' pos='-.682843 0 .282843'
          size='.4 .2 10' zaxis='1 0 1'/>
    <geom name='wall2' type='plane' pos='.682843 0 .282843'
          size='.4 .2 10' zaxis='-1 0 1'/>
    <body name='upper_arm' pos='0 0 .4' childclass='arm'>
      <joint name='arm_root' damping='2' limited='false'/>
      <geom name='upper_arm' size='.02' fromto='0 0 0 0 0 .18'/>
      <body name='middle_arm' pos='0 0 .18' childclass='arm'>
        <joint name='arm_shoulder' damping='1.5' range='-160 160'/>
        <geom name='middle_arm' size='.017' fromto='0 0 0 0 0 .15'/>
        <body name='lower_arm' pos='0 0 .15'>
          <joint name='arm_elbow' damping='1' range='-160 160'/>
          <geom name='lower_arm' size='.014' fromto='0 0 0 0 0 .12'/>
          <body name='hand' pos='0 0 .12'>
            <joint name='arm_wrist' damping='.5' range='-140 140'/>
            <geom name='hand' size='.011' fromto='0 0 0 0 0 .03'/>
            <geom name='palm1' fromto='0 0 .03 .03 0 .045' class='hand'/>
            <geom name='palm2' fromto='0 0 .03 -.03 0 .045' class='hand'/>
            <site name='grasp' pos='0 0 .065'/>
            <body name='pinch site' pos='0 0 .090'>
              <site name='pinch'/>
              <inertial pos='0 0 0' mass='1e-6'
                        diaginertia='1e-12 1e-12 1e-12'/>
            </body>
            <body name='thumb' pos='.03 0 .045' euler='0 -90 0'
                  childclass='hand'>
              <joint name='thumb'/>
              <geom name='thumb1' fromto='0 0 0 .02 0 -.01' size='.007'/>
              <geom name='thumb2' fromto='.02 0 -.01 .04 0 -.01'
                    size='.007'/>
              <site name='thumb_touch'/>
              <body name='thumbtip' pos='.05 0 -.01' childclass='fingertip'>
                <joint name='thumbtip'/>
                <geom name='thumbtip1' pos='-.003 0 0'/>
                <geom name='thumbtip2' pos='.003 0 0'/>
                <site name='thumbtip_touch'/>
              </body>
            </body>
            <body name='finger' pos='-.03 0 .045' euler='0 90 180'
                  childclass='hand'>
              <joint name='finger'/>
              <geom name='finger1' fromto='0 0 0 .02 0 -.01' size='.007'/>
              <geom name='finger2' fromto='.02 0 -.01 .04 0 -.01'
                    size='.007'/>
              <site name='finger_touch'/>
              <body name='fingertip' pos='.05 0 -.01'
                    childclass='fingertip'>
                <joint name='fingertip'/>
                <geom name='fingertip1' pos='-.003 0 0'/>
                <geom name='fingertip2' pos='.003 0 0'/>
                <site name='fingertip_touch'/>
              </body>
            </body>
            <site name='palm_touch' type='box' size='.025 .005 .008'
                  pos='0 0 .043'/>
          </body>
        </body>
      </body>
    </body>
    {props}
  </worldbody>
  <tendon>
    <fixed name='grasp'>
      <joint joint='thumb' coef='.5'/>
      <joint joint='finger' coef='.5'/>
    </fixed>
    <fixed name='coupling'>
      <joint joint='thumb' coef='-.5'/>
      <joint joint='finger' coef='.5'/>
    </fixed>
  </tendon>
  <equality>
    <tendon name='coupling' tendon1='coupling'
            solimp='0.95 0.99 0.001' solref='.005 .5'/>
  </equality>
  <actuator>
    <motor name='root' joint='arm_root' ctrllimited='true'
           ctrlrange='-1 1' gear='12'/>
    <motor name='shoulder' joint='arm_shoulder' ctrllimited='true'
           ctrlrange='-1 1' gear='8'/>
    <motor name='elbow' joint='arm_elbow' ctrllimited='true'
           ctrlrange='-1 1' gear='4'/>
    <motor name='wrist' joint='arm_wrist' ctrllimited='true'
           ctrlrange='-1 1' gear='2'/>
    <motor name='grasp' tendon='grasp' ctrllimited='true'
           ctrlrange='-1 1' gear='2'/>
  </actuator>
</mujoco>
"""


class Bring(base.Task):
    """Bring the prop to the target (manipulator.py Bring)."""

    _INIT_ATTEMPTS = 8
    _TOUCH_SITES = ['palm_touch', 'finger_touch', 'thumb_touch',
                    'fingertip_touch', 'thumbtip_touch']
    _TOUCH_GEOMS = ['palm1', 'finger1', 'thumb1', 'fingertip1', 'thumbtip1']

    def __init__(self, use_peg: bool, insert: bool, fully_observable: bool):
        self._use_peg = use_peg
        self._target = 'target_peg' if use_peg else 'target_ball'
        self._object = 'peg' if use_peg else 'ball'
        self._object_joints = [f'{self._object}_{d}' for d in 'xzy']
        self._receptacle = 'slot' if use_peg else 'cup'
        self._insert = insert
        self._fully_observable = fully_observable

    # -- episode init -------------------------------------------------------
    def initialize_episode(self, model, key):
        """Random arm pose + target/object placement with fixed-attempt
        collision rejection (manipulator.py:186-242, SPMD-safe)."""
        meta = smooth.tree_meta(model)
        pairs = collision.candidate_pairs(model, include_geom_geom=True)
        jadr = {j: model.jnt_qposadr[model.names['joint'][j]]
                for j in (_ARM_JOINTS + self._object_joints)}

        def try_one(k):
            ks = jax.random.split(k, len(_ARM_JOINTS) + 5)
            qpos = jnp.asarray(model.qpos0)
            for i, j in enumerate(_ARM_JOINTS):
                ji = model.names['joint'][j]
                limited = model.jnt_limited[ji]
                lo = model.jnt_range[ji, 0] if limited else -np.pi
                hi = model.jnt_range[ji, 1] if limited else np.pi
                qpos = qpos.at[jadr[j]].set(
                    jax.random.uniform(ks[i], (), minval=lo, maxval=hi))
            # symmetrize hand
            qpos = qpos.at[jadr['finger']].set(qpos[jadr['thumb']])
            # target placement
            kt1, kt2, kt3, ko, kv = ks[len(_ARM_JOINTS):]
            target_x = jax.random.uniform(kt1, (), minval=-.4, maxval=.4)
            target_z = jax.random.uniform(kt2, (), minval=.1, maxval=.4)
            if self._insert:
                target_angle = jax.random.uniform(
                    kt3, (), minval=-np.pi / 3, maxval=np.pi / 3)
            else:
                target_angle = jax.random.uniform(
                    kt3, (), minval=-np.pi, maxval=np.pi)
            # object placement: uniform (in_hand/in_target handled via
            # probability mix on position choice)
            u = jax.random.uniform(ko, ())
            obj_x = jnp.where(u < _P_IN_TARGET, target_x,
                              jax.random.uniform(kv, (), minval=-.5,
                                                 maxval=.5))
            obj_z = jnp.where(u < _P_IN_TARGET, target_z,
                              jax.random.uniform(
                                  jax.random.fold_in(kv, 1), (),
                                  minval=0., maxval=.7))
            obj_a = jnp.where(u < _P_IN_TARGET, target_angle,
                              jax.random.uniform(
                                  jax.random.fold_in(kv, 2), (),
                                  minval=0., maxval=2 * np.pi))
            qpos = qpos.at[jadr[self._object_joints[0]]].set(obj_x)
            qpos = qpos.at[jadr[self._object_joints[1]]].set(obj_z)
            qpos = qpos.at[jadr[self._object_joints[2]]].set(obj_a)

            (xpos, xquat, xmat, geom_xpos, geom_xmat, *_
             ) = smooth.kinematics(model, qpos, meta)
            contact = collision.detect(model, geom_xpos, geom_xmat, pairs)
            params = jnp.stack([target_x, target_z, target_angle])
            return qpos, params, (contact.dist < 0).any()

        keys = jax.random.split(key, self._INIT_ATTEMPTS)
        qposes, params, penet = jax.vmap(try_one)(keys)
        ok = jnp.logical_not(penet)
        idx = jnp.where(ok.any(), jnp.argmax(ok), 0)
        return make_state(model, qpos=qposes[idx]), params[idx]

    def apply_params(self, model, params):
        """Move target (and receptacle for insert tasks) bodies."""
        target_x, target_z, angle = params[0], params[1], params[2]
        tid = model.name2id('body', self._target)
        body_pos = model.body_pos.at[tid, 0].set(target_x)
        body_pos = body_pos.at[tid, 2].set(target_z)
        quat = jnp.stack([jnp.cos(angle / 2), jnp.zeros_like(angle),
                          jnp.sin(angle / 2), jnp.zeros_like(angle)])
        body_quat = model.body_quat.at[tid].set(quat)
        if self._insert:
            rid = model.name2id('body', self._receptacle)
            body_pos = body_pos.at[rid, 0].set(target_x)
            body_pos = body_pos.at[rid, 2].set(target_z)
            body_quat = body_quat.at[rid].set(quat)
        return model.replace(body_pos=body_pos, body_quat=body_quat)

    # -- observations --------------------------------------------------------
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

    def _body_2d_pose(self, model, data, body_name):
        b = model.name2id('body', body_name)
        return jnp.concatenate([
            data.xpos[b][jnp.array([0, 2])],
            data.xquat[b][jnp.array([0, 2])]])

    def get_observation(self, model, phys, data):
        obs = {
            'arm_pos': self._bounded_joint_pos(model, phys),
            'arm_vel': self._joint_vel(model, phys, _ARM_JOINTS),
            'touch': self._touch(model, data),
        }
        if self._fully_observable:
            obs['hand_pos'] = self._body_2d_pose(model, data, 'hand')
            obs['object_pos'] = self._body_2d_pose(model, data,
                                                   self._object)
            obs['object_vel'] = self._joint_vel(model, phys,
                                                self._object_joints)
            obs['target_pos'] = self._body_2d_pose(model, data,
                                                   self._target)
        return obs

    # -- reward ---------------------------------------------------------------
    def _site_distance(self, model, data, s1, s2):
        p1 = data.site_xpos[model.name2id('site', s1)]
        p2 = data.site_xpos[model.name2id('site', s2)]
        return jnp.linalg.norm(p1 - p2)

    def _is_close(self, distance):
        return rewards.tolerance(distance, (0, _CLOSE), _CLOSE * 2)

    def get_reward(self, model, phys, data, ctrl):
        if self._use_peg:
            grasp = self._is_close(
                self._site_distance(model, data, 'peg_grasp', 'grasp'))
            pinch = self._is_close(
                self._site_distance(model, data, 'peg_pinch', 'pinch'))
            grasping = (grasp + pinch) / 2
            bring = self._is_close(
                self._site_distance(model, data, 'peg', 'target_peg'))
            bring_tip = self._is_close(
                self._site_distance(model, data, 'target_peg_tip',
                                    'peg_tip'))
            bringing = (bring + bring_tip) / 2
            return jnp.maximum(bringing, grasping / 3)
        return self._is_close(
            self._site_distance(model, data, 'ball', 'target_ball'))


def _env(use_peg, insert, fully_observable, time_limit, environment_kwargs):
    model = mjcf.parse(_make_model_xml(use_peg, insert))
    model = model.replace(opt=model.opt.replace(
        enable_geom_geom_contacts=True))
    task = Bring(use_peg=use_peg, insert=insert,
                 fully_observable=fully_observable)
    kwargs = dict(environment_kwargs or {})
    kwargs.setdefault('control_timestep', _CONTROL_TIMESTEP)
    return control.Environment(model, task, time_limit=time_limit, **kwargs)


@SUITE.add('benchmarking', 'hard')
def bring_ball(fully_observable=True, time_limit=_TIME_LIMIT,
               environment_kwargs=None):
    return _env(False, False, fully_observable, time_limit,
                environment_kwargs)


@SUITE.add('hard')
def bring_peg(fully_observable=True, time_limit=_TIME_LIMIT,
              environment_kwargs=None):
    return _env(True, False, fully_observable, time_limit,
                environment_kwargs)


@SUITE.add('hard')
def insert_ball(fully_observable=True, time_limit=_TIME_LIMIT,
                environment_kwargs=None):
    return _env(False, True, fully_observable, time_limit,
                environment_kwargs)


@SUITE.add('hard')
def insert_peg(fully_observable=True, time_limit=_TIME_LIMIT,
               environment_kwargs=None):
    return _env(True, True, fully_observable, time_limit,
                environment_kwargs)
