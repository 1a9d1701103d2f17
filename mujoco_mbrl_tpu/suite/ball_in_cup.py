"""Ball-in-cup domain: catch.

Task contract from the reference
(``dm_control/dm_control/suite/ball_in_cup.py``); model constants from its
``ball_in_cup.xml``. The string is a length-limited spatial tendon
(physics.solver tendon-limit rows); ball-cup contacts are sphere-capsule.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..physics import collision, make_state, mjcf, smooth
from . import base, control
from .registry import TaggedTasks

SUITE = TaggedTasks()
_DEFAULT_TIME_LIMIT = 20
_CONTROL_TIMESTEP = .02

# target site half-sizes and position from the reference XML (site elements
# are visual+sensor-only here, so the reward constants live in the task)
_TARGET_SIZE_X = .05
_TARGET_SIZE_Z = .05
_TARGET_OFFSET = jnp.array([0.0, 0.0, -.05])   # relative to cup body

_XML = """
<mujoco model='ball in cup'>
  <default>
    <motor ctrllimited='true' ctrlrange='-1 1' gear='5'/>
    <default class='cup'>
      <joint type='slide' damping='3' stiffness='20'/>
      <geom type='capsule' size='.008'/>
    </default>
  </default>
  <worldbody>
    <body name='cup' pos='0 0 .6' childclass='cup'>
      <joint name='cup_x' axis='1 0 0'/>
      <joint name='cup_z' axis='0 0 1'/>
      <geom name='cup_part_0' fromto='-.05 0 0 -.05 0 -.075'/>
      <geom name='cup_part_1' fromto='-.05 0 -.075 -.025 0 -.1'/>
      <geom name='cup_part_2' fromto='-.025 0 -.1 .025 0 -.1'/>
      <geom name='cup_part_3' fromto='.025 0 -.1 .05 0 -.075'/>
      <geom name='cup_part_4' fromto='.05 0 -.075 .05 0 0'/>
      <site name='cup' pos='0 0 -.108'/>
    </body>
    <body name='ball' pos='0 0 .2'>
      <joint name='ball_x' type='slide' axis='1 0 0'/>
      <joint name='ball_z' type='slide' axis='0 0 1'/>
      <geom name='ball' type='sphere' size='.025'/>
      <site name='ball'/>
    </body>
  </worldbody>
  <actuator>
    <motor name='x' joint='cup_x'/>
    <motor name='z' joint='cup_z'/>
  </actuator>
  <tendon>
    <spatial name='string' limited='true' range='0 0.3' width='0.003'>
      <site site='ball'/>
      <site site='cup'/>
    </spatial>
  </tendon>
</mujoco>
"""


class BallInCup(base.Task):
    """Swing the ball into the cup; sparse reward."""
    # observation/reward read only position/velocity-stage Data
    # -> the per-step observation forward skips the constraint
    # solve (engine.forward acc_stage=False)
    OBSERVES_ACC = False

    _INIT_ATTEMPTS = 8

    def initialize_episode(self, model, key):
        """Collision-free random ball position (ball_in_cup.py:77-87),
        lockstep-vmap safe via fixed-attempt rejection sampling."""
        meta = smooth.tree_meta(model)
        pairs = collision.candidate_pairs(model, include_geom_geom=True)

        def try_one(k):
            kx, kz = jax.random.split(k)
            qpos = jnp.asarray(model.qpos0)
            qpos = qpos.at[model.jnt_qposadr[
                model.names['joint']['ball_x']]].set(
                jax.random.uniform(kx, (), minval=-.2, maxval=.2))
            qpos = qpos.at[model.jnt_qposadr[
                model.names['joint']['ball_z']]].set(
                jax.random.uniform(kz, (), minval=.2, maxval=.5))
            (xpos, xquat, xmat, geom_xpos, geom_xmat, *_
             ) = smooth.kinematics(model, qpos, meta)
            contact = collision.detect(model, geom_xpos, geom_xmat, pairs)
            return qpos, (contact.dist < 0).any()

        keys = jax.random.split(key, self._INIT_ATTEMPTS)
        qposes, penet = jax.vmap(try_one)(keys)
        ok = jnp.logical_not(penet)
        idx = jnp.where(ok.any(), jnp.argmax(ok), 0)
        return make_state(model, qpos=qposes[idx]), ()

    def get_observation(self, model, phys, data):
        return {'position': phys.qpos, 'velocity': phys.qvel}

    def get_reward(self, model, phys, data, ctrl):
        cup = model.name2id('body', 'cup')
        ball = model.name2id('body', 'ball')
        target = data.xpos[cup] + _TARGET_OFFSET
        d = jnp.abs(jnp.stack([target[0] - data.xpos[ball, 0],
                               target[2] - data.xpos[ball, 2]]))
        ball_size = float(np.asarray(model.geom_size)[
            model.name2id('geom', 'ball'), 0])
        lim = jnp.array([_TARGET_SIZE_X - ball_size,
                         _TARGET_SIZE_Z - ball_size])
        return jnp.all(d < lim).astype(phys.qpos.dtype)


@SUITE.add('benchmarking', 'easy')
def catch(time_limit=_DEFAULT_TIME_LIMIT, environment_kwargs=None):
    model = mjcf.parse(_XML)
    model = model.replace(opt=model.opt.replace(
        enable_geom_geom_contacts=True))
    kwargs = dict(environment_kwargs or {})
    kwargs.setdefault('control_timestep', _CONTROL_TIMESTEP)
    return control.Environment(model, BallInCup(),
                               time_limit=time_limit, **kwargs)
