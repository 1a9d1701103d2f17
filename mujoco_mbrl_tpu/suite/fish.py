"""Fish domain: upright / swim.

Task contract from the reference (``dm_control/dm_control/suite/fish.py``);
model constants transcribed from its ``fish.xml`` (density-5000 fluid,
gravity off, position actuators, fin-coupling tendons).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..physics import make_state, mjcf
from . import base, control, rewards
from .registry import TaggedTasks

SUITE = TaggedTasks()
_DEFAULT_TIME_LIMIT = 40
_CONTROL_TIMESTEP = .04
_JOINTS = ['tail1', 'tail_twist', 'tail2', 'finright_roll',
           'finright_pitch', 'finleft_roll', 'finleft_pitch']

_XML = """
<mujoco model='fish'>
  <option timestep='0.004' density='5000'>
    <flag gravity='disable' contact='disable' limit='disable'/>
  </option>
  <default>
    <default class='fish'>
      <joint type='hinge' limited='false' range='-60 60' damping='2e-5'
             solreflimit='.1 1' solimplimit='0 .8 .1'/>
    </default>
  </default>
  <worldbody>
    <geom name='target' type='sphere' pos='0 .4 .1' size='.04'/>
    <body name='torso' pos='0 0 .1' childclass='fish'>
      <joint name='root' type='free' damping='0' limited='false'/>
      <geom name='torso_massive' type='box' size='.002 .06 .03'/>
      <geom name='mouth' type='capsule' fromto='0 .079 0 0 .07 0'
            size='.005' mass='0'/>
      <site name='torso' size='.01'/>
      <body name='tail1' pos='0 -.09 0'>
        <joint name='tail1' axis='0 0 1' pos='0 .01 0'/>
        <joint name='tail_twist' axis='0 1 0' pos='0 .01 0'
               range='-30 30'/>
        <geom name='tail1' type='ellipsoid' size='.001 .008 .016'/>
        <body name='tail2' pos='0 -.028 0'>
          <joint name='tail2' axis='0 0 1' pos='0 .02 0'
                 stiffness='8e-5'/>
          <geom name='tail2' type='ellipsoid' size='.001 .018 .035'/>
        </body>
      </body>
      <body name='finright' pos='.01 0 0'>
        <joint name='finright_roll' axis='0 1 0'/>
        <joint name='finright_pitch' axis='1 0 0' pos='0 .005 0'/>
        <geom name='finright' type='ellipsoid' pos='.015 0 0'
              size='.02 .015 .001'/>
      </body>
      <body name='finleft' pos='-.01 0 0'>
        <joint name='finleft_roll' axis='0 1 0'/>
        <joint name='finleft_pitch' axis='1 0 0' pos='0 .005 0'/>
        <geom name='finleft' type='ellipsoid' pos='-.015 0 0'
              size='.02 .015 .001'/>
      </body>
    </body>
  </worldbody>
  <tendon>
    <fixed name='fins_flap'>
      <joint joint='finleft_roll' coef='-.5'/>
      <joint joint='finright_roll' coef='.5'/>
    </fixed>
    <fixed name='fins_sym' stiffness='1e-4'>
      <joint joint='finleft_roll' coef='.5'/>
      <joint joint='finright_roll' coef='.5'/>
    </fixed>
  </tendon>
  <actuator>
    <position name='tail' joint='tail1' ctrllimited='true'
              ctrlrange='-1 1' kp='5e-4'/>
    <position name='tail_twist' joint='tail_twist' ctrllimited='true'
              ctrlrange='-1 1' kp='1e-4'/>
    <position name='fins_flap' tendon='fins_flap' ctrllimited='true'
              ctrlrange='-1 1' kp='3e-4'/>
    <position name='finleft_pitch' joint='finleft_pitch' ctrllimited='true'
              ctrlrange='-1 1' kp='1e-4'/>
    <position name='finright_pitch' joint='finright_pitch'
              ctrllimited='true' ctrlrange='-1 1' kp='1e-4'/>
  </actuator>
</mujoco>
"""


class _FishTask(base.Task):
    # observation/reward read only position/velocity-stage Data
    # -> the per-step observation forward skips the constraint
    # solve (engine.forward acc_stage=False)
    OBSERVES_ACC = False
    def _joint_qpos(self, model, phys):
        return jnp.stack([phys.qpos[model.jnt_qposadr[
            model.names['joint'][j]]] for j in _JOINTS])

    def _joint_qvel(self, model, phys):
        return jnp.stack([phys.qvel[model.jnt_dofadr[
            model.names['joint'][j]]] for j in _JOINTS])

    def _init_qpos(self, model, key):
        k1, k2 = jax.random.split(key)
        qpos = jnp.asarray(model.qpos0)
        quat = jax.random.normal(k1, (4,))
        quat = quat / jnp.linalg.norm(quat)
        qpos = qpos.at[3:7].set(quat)
        vals = jax.random.uniform(k2, (len(_JOINTS),), minval=-.2,
                                  maxval=.2)
        for i, j in enumerate(_JOINTS):
            qpos = qpos.at[model.jnt_qposadr[
                model.names['joint'][j]]].set(vals[i])
        return qpos


class Upright(_FishTask):
    """Right the fish (fish.py Upright)."""

    def initialize_episode(self, model, key):
        return make_state(model, qpos=self._init_qpos(model, key)), ()

    def get_observation(self, model, phys, data):
        torso = model.name2id('body', 'torso')
        return {
            'joint_angles': self._joint_qpos(model, phys),
            'upright': data.ximat[torso, 2, 2],
            'velocity': phys.qvel,
        }

    def get_reward(self, model, phys, data, ctrl):
        torso = model.name2id('body', 'torso')
        return rewards.tolerance(data.ximat[torso, 2, 2], (1, 1), margin=1)


class Swim(_FishTask):
    """Swim the mouth to the target (fish.py Swim)."""

    def initialize_episode(self, model, key):
        k1, k2 = jax.random.split(key)
        qpos = self._init_qpos(model, k1)
        kx, ky, kz = jax.random.split(k2, 3)
        target = jnp.stack([
            jax.random.uniform(kx, (), minval=-.4, maxval=.4),
            jax.random.uniform(ky, (), minval=-.4, maxval=.4),
            jax.random.uniform(kz, (), minval=.1, maxval=.3)])
        return make_state(model, qpos=qpos), target

    def apply_params(self, model, params):
        tid = model.name2id('geom', 'target')
        return model.replace(geom_pos=model.geom_pos.at[tid].set(params))

    def _mouth_to_target(self, model, data):
        tid = model.name2id('geom', 'target')
        mid = model.name2id('geom', 'mouth')
        vec = data.geom_xpos[tid] - data.geom_xpos[mid]
        return vec @ data.geom_xmat[mid]

    def get_observation(self, model, phys, data):
        torso = model.name2id('body', 'torso')
        return {
            'joint_angles': self._joint_qpos(model, phys),
            'upright': data.ximat[torso, 2, 2],
            'target': self._mouth_to_target(model, data),
            'velocity': phys.qvel,
        }

    def get_reward(self, model, phys, data, ctrl):
        tid = model.name2id('geom', 'target')
        mid = model.name2id('geom', 'mouth')
        radii = float(np.asarray(model.geom_size)[tid, 0]
                      + np.asarray(model.geom_size)[mid, 0])
        in_target = rewards.tolerance(
            jnp.linalg.norm(self._mouth_to_target(model, data)),
            bounds=(0, radii), margin=2 * radii)
        torso = model.name2id('body', 'torso')
        is_upright = 0.5 * (data.ximat[torso, 2, 2] + 1)
        return (7 * in_target + is_upright) / 8


def _env(task, time_limit, environment_kwargs):
    model = mjcf.parse(_XML)
    kwargs = dict(environment_kwargs or {})
    kwargs.setdefault('control_timestep', _CONTROL_TIMESTEP)
    return control.Environment(model, task, time_limit=time_limit, **kwargs)


@SUITE.add('benchmarking')
def upright(time_limit=_DEFAULT_TIME_LIMIT, environment_kwargs=None):
    return _env(Upright(), time_limit, environment_kwargs)


@SUITE.add('benchmarking')
def swim(time_limit=_DEFAULT_TIME_LIMIT, environment_kwargs=None):
    return _env(Swim(), time_limit, environment_kwargs)
