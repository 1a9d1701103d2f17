"""Finger domain: spin / turn_easy / turn_hard.

Task contract from the reference (``dm_control/dm_control/suite/finger.py``);
model constants transcribed from its ``finger.xml`` (gravity off, elliptic
cone, frictionloss spinner hinge, fingertip-spinner contacts).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..physics import collision, make_state, mjcf, smooth
from . import base, control, randomizers, sensors
from .registry import TaggedTasks

SUITE = TaggedTasks()
_DEFAULT_TIME_LIMIT = 20
_CONTROL_TIMESTEP = .02
_EASY_TARGET_SIZE = 0.07
_HARD_TARGET_SIZE = 0.03
_STOP_VELOCITY = 1e-6
_SPIN_VELOCITY = 15.0

_XML = """
<mujoco model='finger'>
  <option timestep='0.01' cone='elliptic' iterations='200'>
    <flag gravity='disable'/>
  </option>
  <default>
    <geom solimp='0 0.9 0.01' solref='.02 1'/>
    <joint type='hinge' axis='0 -1 0'/>
    <motor ctrllimited='true' ctrlrange='-1 1'/>
    <default class='finger'>
      <joint damping='2.5' limited='true'/>
      <site type='ellipsoid' size='.025 .03 .025'/>
    </default>
  </default>
  <worldbody>
    <geom name='ground' type='plane' pos='0 0 0' size='.6 .2 10'/>
    <body name='proximal' pos='-.2 0 .4' childclass='finger'>
      <geom name='proximal_decoration' type='cylinder'
            fromto='0 -.033 0 0 .033 0' size='.034'/>
      <joint name='proximal' range='-110 110' ref='-90'/>
      <geom name='proximal' type='capsule' size='.03'
            fromto='0 0 0 0 0 -.17'/>
      <body name='distal' pos='0 0 -.18' childclass='finger'>
        <joint name='distal' range='-110 110'/>
        <geom name='distal' type='capsule' size='.028'
              fromto='0 0 0 0 0 -.16' contype='0' conaffinity='0'/>
        <geom name='fingertip' type='capsule' size='.03'
              fromto='0 0 -.13 0 0 -.161'/>
        <site name='touchtop' pos='.01 0 -.17'/>
        <site name='touchbottom' pos='-.01 0 -.17'/>
      </body>
    </body>
    <body name='spinner' pos='.2 0 .4'>
      <joint name='hinge' frictionloss='.1' damping='.5'/>
      <geom name='cap1' type='capsule' size='.04 .09' pos='.02 0 0'/>
      <geom name='cap2' type='capsule' size='.04 .09' pos='-.02 0 0'/>
      <site name='tip' pos='0 0 .13'/>
      <geom name='spinner_decoration' type='cylinder'
            fromto='0 -.045 0 0 .045 0' size='.02'/>
    </body>
    <site name='target' pos='0 0 .4'/>
  </worldbody>
  <actuator>
    <motor name='proximal' joint='proximal' gear='30'/>
    <motor name='distal' joint='distal' gear='15'/>
  </actuator>
</mujoco>
"""


class _FingerTask(base.Task):
    _INIT_ATTEMPTS = 8

    def _random_joint_angles(self, model, key):
        """Collision-free random joint angles (finger.py
        _set_random_joint_angles), fixed-attempt rejection sampling."""
        meta = smooth.tree_meta(model)
        pairs = collision.candidate_pairs(model, include_geom_geom=True)

        def try_one(k):
            qpos = randomizers.randomize_limited_and_rotational_joints(
                model, jnp.asarray(model.qpos0), k)
            (xpos, xquat, xmat, geom_xpos, geom_xmat, *_
             ) = smooth.kinematics(model, qpos, meta)
            contact = collision.detect(model, geom_xpos, geom_xmat, pairs)
            return qpos, (contact.dist < 0).any()

        keys = jax.random.split(key, self._INIT_ATTEMPTS)
        qposes, penet = jax.vmap(try_one)(keys)
        ok = jnp.logical_not(penet)
        idx = jnp.where(ok.any(), jnp.argmax(ok), 0)
        return qposes[idx]

    def _touch(self, model, data):
        tip_geom = model.name2id('geom', 'fingertip')
        top = model.name2id('site', 'touchtop')
        bot = model.name2id('site', 'touchbottom')
        return jnp.log1p(jnp.stack([
            sensors.touch(model, data, top, tip_geom),
            sensors.touch(model, data, bot, tip_geom)]))

    def _tip_position(self, model, data):
        tip = model.name2id('site', 'tip')
        spinner = model.name2id('body', 'spinner')
        return (data.site_xpos[tip][jnp.array([0, 2])]
                - data.xpos[spinner][jnp.array([0, 2])])

    def _bounded_position(self, model, phys, data):
        return jnp.concatenate([phys.qpos[:2],
                                self._tip_position(model, data)])


class Spin(_FingerTask):
    """Keep the spinner rotating (finger.py Spin)."""

    def initialize_episode(self, model, key):
        return make_state(model,
                          qpos=self._random_joint_angles(model, key)), ()

    def get_observation(self, model, phys, data):
        return {
            'position': self._bounded_position(model, phys, data),
            'velocity': phys.qvel,
            'touch': self._touch(model, data),
        }

    def get_reward(self, model, phys, data, ctrl):
        hinge_dof = model.jnt_dofadr[model.names['joint']['hinge']]
        return (phys.qvel[hinge_dof] <= -_SPIN_VELOCITY).astype(
            phys.qpos.dtype)


class Turn(_FingerTask):
    """Turn the spinner tip to a random target angle (finger.py Turn)."""

    def __init__(self, target_radius: float):
        self._target_radius = target_radius

    def initialize_episode(self, model, key):
        k1, k2 = jax.random.split(key)
        target_angle = jax.random.uniform(k1, (), minval=-np.pi,
                                          maxval=np.pi)
        cap1 = model.name2id('geom', 'cap1')
        radius = float(np.asarray(model.geom_size)[cap1].sum())
        spinner = model.name2id('body', 'spinner')
        hinge_pos = np.asarray(model.body_pos)[spinner]   # hinge anchor
        target_xz = jnp.stack([
            hinge_pos[0] + radius * jnp.sin(target_angle),
            hinge_pos[2] + radius * jnp.cos(target_angle)])
        qpos = self._random_joint_angles(model, k2)
        return make_state(model, qpos=qpos), target_xz

    def apply_params(self, model, params):
        tid = model.name2id('site', 'target')
        site_pos = model.site_pos.at[tid, 0].set(params[0])
        site_pos = site_pos.at[tid, 2].set(params[1])
        return model.replace(site_pos=site_pos)

    def _target_position(self, model, data):
        tid = model.name2id('site', 'target')
        spinner = model.name2id('body', 'spinner')
        return (data.site_xpos[tid][jnp.array([0, 2])]
                - data.xpos[spinner][jnp.array([0, 2])])

    def _dist_to_target(self, model, data):
        d = self._target_position(model, data) - self._tip_position(
            model, data)
        return jnp.linalg.norm(d) - self._target_radius

    def get_observation(self, model, phys, data):
        return {
            'position': self._bounded_position(model, phys, data),
            'velocity': phys.qvel,
            'touch': self._touch(model, data),
            'target_position': self._target_position(model, data),
            'dist_to_target': self._dist_to_target(model, data),
        }

    def get_reward(self, model, phys, data, ctrl):
        return (self._dist_to_target(model, data) <= 0).astype(
            phys.qpos.dtype)


def _env(task, time_limit, environment_kwargs, spin=False):
    model = mjcf.parse(_XML)
    model = model.replace(opt=model.opt.replace(
        enable_geom_geom_contacts=True))
    if spin:
        # Spin overrides the spinner hinge damping (finger.py:150)
        hinge_dof = model.jnt_dofadr[model.names['joint']['hinge']]
        model = model.replace(
            dof_damping=model.dof_damping.at[hinge_dof].set(.03))
    kwargs = dict(environment_kwargs or {})
    kwargs.setdefault('control_timestep', _CONTROL_TIMESTEP)
    return control.Environment(model, task, time_limit=time_limit, **kwargs)


@SUITE.add('benchmarking')
def spin(time_limit=_DEFAULT_TIME_LIMIT, environment_kwargs=None):
    return _env(Spin(), time_limit, environment_kwargs, spin=True)


@SUITE.add('benchmarking')
def turn_easy(time_limit=_DEFAULT_TIME_LIMIT, environment_kwargs=None):
    return _env(Turn(_EASY_TARGET_SIZE), time_limit, environment_kwargs)


@SUITE.add('benchmarking')
def turn_hard(time_limit=_DEFAULT_TIME_LIMIT, environment_kwargs=None):
    return _env(Turn(_HARD_TARGET_SIZE), time_limit, environment_kwargs)
