"""Two-link planar reacher: easy / hard.

Task contract from the reference (``dm_control/dm_control/suite/reacher.py``);
model constants transcribed from its ``reacher.xml``. The target position is
randomized per episode and carried as env params (the TPU-native analogue of
writing ``physics.named.model.geom_pos['target']``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..physics import make_state, mjcf
from . import base, control, randomizers, rewards
from .registry import TaggedTasks

SUITE = TaggedTasks()
_DEFAULT_TIME_LIMIT = 20
_BIG_TARGET = .05
_SMALL_TARGET = .015

_XML = """
<mujoco model='two-link planar reacher'>
  <option timestep='0.02'>
    <flag contact='disable'/>
  </option>
  <default>
    <joint type='hinge' axis='0 0 1' damping='0.01'/>
    <motor gear='.05' ctrlrange='-1 1' ctrllimited='true'/>
  </default>
  <worldbody>
    <camera name='fixed' pos='0 0 .75' quat='1 0 0 0'/>
    <body name='arm' pos='0 0 .01'>
      <geom name='arm' type='capsule' fromto='0 0 0 0.12 0 0' size='.01'/>
      <joint name='shoulder'/>
      <body name='hand' pos='.12 0 0'>
        <geom name='hand' type='capsule' fromto='0 0 0 0.1 0 0' size='.01'/>
        <joint name='wrist' limited='true' range='-160 160'/>
        <body name='finger' pos='.12 0 0'>
          <geom name='finger' type='sphere' size='.01'/>
        </body>
      </body>
    </body>
    <geom name='target' pos='0 0 .01' type='sphere' size='.05'/>
  </worldbody>
  <actuator>
    <motor name='shoulder' joint='shoulder'/>
    <motor name='wrist' joint='wrist'/>
  </actuator>
</mujoco>
"""


class Reacher(base.Task):
    """Reach the randomized target."""
    # observation/reward read only position/velocity-stage Data
    # -> the per-step observation forward skips the constraint
    # solve (engine.forward acc_stage=False)
    OBSERVES_ACC = False

    def __init__(self, target_size: float):
        self._target_size = target_size

    def initialize_episode(self, model, key):
        k1, k2, k3 = jax.random.split(key, 3)
        qpos = randomizers.randomize_limited_and_rotational_joints(
            model, jnp.asarray(model.qpos0), k1)
        angle = jax.random.uniform(k2, (), minval=0, maxval=2 * np.pi)
        radius = jax.random.uniform(k3, (), minval=.05, maxval=.20)
        target_xy = jnp.stack([radius * jnp.sin(angle),
                               radius * jnp.cos(angle)])
        return make_state(model, qpos=qpos), target_xy

    def apply_params(self, model, params):
        tid = model.name2id('geom', 'target')
        return model.replace(
            geom_pos=model.geom_pos.at[tid, :2].set(params))

    def _finger_to_target(self, model, data):
        tid = model.name2id('geom', 'target')
        fid = model.name2id('geom', 'finger')
        return data.geom_xpos[tid, :2] - data.geom_xpos[fid, :2]

    def get_observation(self, model, phys, data):
        return {
            'position': phys.qpos,
            'to_target': self._finger_to_target(model, data),
            'velocity': phys.qvel,
        }

    def get_reward(self, model, phys, data, ctrl):
        fid = model.name2id('geom', 'finger')
        # static task constant: extract via numpy so it stays concrete
        radii = self._target_size + float(np.asarray(model.geom_size)[fid, 0])
        dist = jnp.linalg.norm(self._finger_to_target(model, data))
        return rewards.tolerance(dist, (0, radii))


def _env(target_size, time_limit, environment_kwargs):
    model = mjcf.parse(_XML)
    # target size is fixed per task variant: bake it into the model
    tid = model.name2id('geom', 'target')
    model = model.replace(
        geom_size=model.geom_size.at[tid, 0].set(target_size))
    task = Reacher(target_size=target_size)
    return control.Environment(model, task, time_limit=time_limit,
                               **(environment_kwargs or {}))


@SUITE.add('benchmarking', 'easy')
def easy(time_limit=_DEFAULT_TIME_LIMIT, environment_kwargs=None):
    return _env(_BIG_TARGET, time_limit, environment_kwargs)


@SUITE.add('benchmarking')
def hard(time_limit=_DEFAULT_TIME_LIMIT, environment_kwargs=None):
    return _env(_SMALL_TARGET, time_limit, environment_kwargs)
