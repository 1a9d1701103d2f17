"""Planar point-mass domain: easy / hard.

Task contract from the reference (``dm_control/dm_control/suite/point_mass.py``);
model constants transcribed from its ``point_mass.xml``. The `hard` variant
randomizes the actuator-to-joint coupling each episode — here that is a
per-episode override of the fixed-tendon moment matrix carried in the env
params pytree (the TPU-native analogue of mutating ``model.wrap_prm``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..physics import make_state, mjcf
from . import base, control, randomizers, rewards
from .registry import TaggedTasks

SUITE = TaggedTasks()
_DEFAULT_TIME_LIMIT = 20

_XML = """
<mujoco model='planar point mass'>
  <option timestep='0.02'>
    <flag contact='disable'/>
  </option>
  <default>
    <joint type='hinge' axis='0 0 1' limited='true' range='-.29 .29'
           damping='1'/>
    <motor gear='.1' ctrlrange='-1 1' ctrllimited='true'/>
  </default>
  <worldbody>
    <camera name='fixed' pos='0 0 .75' quat='1 0 0 0'/>
    <body name='pointmass' pos='0 0 .01'>
      <joint name='root_x' type='slide' pos='0 0 0' axis='1 0 0'/>
      <joint name='root_y' type='slide' pos='0 0 0' axis='0 1 0'/>
      <geom name='pointmass' type='sphere' size='.01' mass='.3'/>
    </body>
    <geom name='target' pos='0 0 .01' type='sphere' size='.015'/>
  </worldbody>
  <tendon>
    <fixed name='t1'>
      <joint joint='root_x' coef='1'/>
      <joint joint='root_y' coef='0'/>
    </fixed>
    <fixed name='t2'>
      <joint joint='root_x' coef='0'/>
      <joint joint='root_y' coef='1'/>
    </fixed>
  </tendon>
  <actuator>
    <motor name='t1' tendon='t1'/>
    <motor name='t2' tendon='t2'/>
  </actuator>
</mujoco>
"""


class PointMass(base.Task):
    """Reach the target with smooth reward."""
    # observation/reward read only position/velocity-stage Data
    # -> the per-step observation forward skips the constraint
    # solve (engine.forward acc_stage=False)
    OBSERVES_ACC = False

    def __init__(self, randomize_gains: bool):
        self._randomize_gains = randomize_gains

    def initialize_episode(self, model, key):
        k1, k2 = jax.random.split(key)
        qpos = randomizers.randomize_limited_and_rotational_joints(
            model, jnp.asarray(model.qpos0), k1)
        state = make_state(model, qpos=qpos)
        # params = (target_xy, tendon_moment?) — target defaults to origin
        # but is overridable by goal-state agents (env_wrappers.py:174-181).
        target_xy = jnp.zeros(2)
        if not self._randomize_gains:
            return state, target_xy
        # Random, not-too-parallel actuation directions: fixed-trial
        # rejection sampling so shapes stay static under jit.
        kd1, kd2 = jax.random.split(k2)
        dir1 = jax.random.normal(kd1, (2,))
        dir1 = dir1 / jnp.linalg.norm(dir1)

        cands = jax.random.normal(kd2, (20, 2))
        cands = cands / jnp.linalg.norm(cands, axis=1, keepdims=True)
        ok = jnp.abs(cands @ dir1) <= 0.9
        idx = jnp.argmax(ok)   # first acceptable candidate
        dir2 = cands[idx]
        tendon_moment = jnp.stack([dir1, dir2])
        return state, (target_xy, tendon_moment)

    def apply_params(self, model, params):
        if self._randomize_gains:
            target_xy, tendon_moment = params
            model = model.replace(tendon_moment=tendon_moment)
        else:
            target_xy = params
        tid = model.name2id('geom', 'target')
        return model.replace(
            geom_pos=model.geom_pos.at[tid, :2].set(target_xy))

    def get_observation(self, model, phys, data):
        return {'position': phys.qpos, 'velocity': phys.qvel}

    def get_reward(self, model, phys, data, ctrl):
        import numpy as np
        target = model.name2id('geom', 'target')
        mass = model.name2id('geom', 'pointmass')
        # static task constant: extract via numpy so it stays concrete
        target_size = float(np.asarray(model.geom_size)[target, 0])
        dist = jnp.linalg.norm(data.geom_xpos[target] - data.geom_xpos[mass])
        near_target = rewards.tolerance(
            dist, (0, target_size), margin=target_size)
        control_reward = rewards.tolerance(ctrl, margin=1, value_at_margin=0,
                                           sigmoid='quadratic').mean()
        small_control = (control_reward + 4) / 5
        return near_target * small_control


@SUITE.add('benchmarking', 'easy')
def easy(time_limit=_DEFAULT_TIME_LIMIT, environment_kwargs=None):
    model = mjcf.parse(_XML)
    task = PointMass(randomize_gains=False)
    return control.Environment(model, task, time_limit=time_limit,
                               **(environment_kwargs or {}))


@SUITE.add()
def hard(time_limit=_DEFAULT_TIME_LIMIT, environment_kwargs=None):
    model = mjcf.parse(_XML)
    task = PointMass(randomize_gains=True)
    return control.Environment(model, task, time_limit=time_limit,
                               **(environment_kwargs or {}))
