"""Swimmer domain: swimmer6 / swimmer15 (+ parametric swimmer()).

Task contract from the reference (``dm_control/dm_control/suite/swimmer.py``);
model constants transcribed from its ``swimmer.xml``. Propulsion comes from
the fluid density drag (option density=3000, physics.smooth.fluid_force).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..physics import make_state, mjcf
from . import base, control, randomizers, rewards
from .registry import TaggedTasks

SUITE = TaggedTasks()
_DEFAULT_TIME_LIMIT = 30
_CONTROL_TIMESTEP = .03


def _make_model_xml(n_bodies: int) -> str:
    """Programmatic n-link swimmer (swimmer.py _make_model semantics)."""
    if n_bodies < 3:
        raise ValueError(f'At least 3 bodies required. Received {n_bodies}')
    joint_limit = 360.0 / n_bodies
    segments = ''
    for i in range(n_bodies - 1):
        segments += (
            f"<body name='segment_{i}' pos='0 .1 0'>"
            f"<geom name='visual_{i}' class='visual'/>"
            f"<geom name='inertial_{i}' class='inertial'/>"
            f"<site name='site_{i}'/>"
            f"<joint name='joint_{i}' range='{-joint_limit} {joint_limit}'/>"
        )
    segments += '</body>' * (n_bodies - 1)
    motors = ''.join(
        f"<motor name='motor_{i}' joint='joint_{i}'/>"
        for i in range(n_bodies - 1))
    return f"""
<mujoco model='swimmer'>
  <option timestep='0.002' density='3000'>
    <flag contact='disable'/>
  </option>
  <default>
    <default class='swimmer'>
      <joint type='hinge' pos='0 -.05 0' axis='0 0 1' limited='true'
             solreflimit='.05 1' solimplimit='0 .8 .1' armature='1e-6'/>
      <default class='inertial'>
        <geom type='box' size='.001 .05 .01' mass='.01'/>
      </default>
      <default class='visual'>
        <geom type='capsule' size='.01' fromto='0 -.05 0 0 .05 0'
              mass='0'/>
      </default>
      <site size='.01'/>
    </default>
    <default class='free'>
      <joint limited='false' stiffness='0' armature='0'/>
    </default>
    <motor gear='5e-4' ctrllimited='true' ctrlrange='-1 1'/>
  </default>
  <worldbody>
    <body name='head' pos='0 0 .05' childclass='swimmer'>
      <geom name='nose' type='sphere' pos='0 -.06 0' size='.004' mass='0'/>
      <joint name='rootx' class='free' type='slide' axis='1 0 0'
             pos='0 -.05 0'/>
      <joint name='rooty' class='free' type='slide' axis='0 1 0'
             pos='0 -.05 0'/>
      <joint name='rootz' class='free' type='hinge' axis='0 0 1'
             pos='0 -.05 0'/>
      <geom name='inertial' class='inertial'/>
      <geom name='visual' class='visual'/>
      <site name='head'/>
      {segments}
    </body>
    <geom name='target' type='sphere' pos='1 1 .05' size='.1'/>
  </worldbody>
  <actuator>{motors}</actuator>
</mujoco>
"""


class Swimmer(base.Task):
    """Swim the nose to the randomized target."""
    # observation/reward read only position/velocity-stage Data
    # -> the per-step observation forward skips the constraint
    # solve (engine.forward acc_stage=False)
    OBSERVES_ACC = False

    def initialize_episode(self, model, key):
        k1, k2, k3 = jax.random.split(key, 3)
        qpos = randomizers.randomize_limited_and_rotational_joints(
            model, jnp.asarray(model.qpos0), k1)
        # close target with prob .2, far otherwise (swimmer.py:189-193)
        close = jax.random.uniform(k2, ()) < 0.2
        box = jnp.where(close, 0.3, 2.0)
        target_xy = jax.random.uniform(k3, (2,), minval=-1.0,
                                       maxval=1.0) * box
        return make_state(model, qpos=qpos), target_xy

    def apply_params(self, model, params):
        tid = model.name2id('geom', 'target')
        return model.replace(
            geom_pos=model.geom_pos.at[tid, :2].set(params))

    def _nose_to_target(self, model, data):
        tid = model.name2id('geom', 'target')
        nid = model.name2id('geom', 'nose')
        head = model.name2id('body', 'head')
        vec = data.geom_xpos[tid] - data.geom_xpos[nid]
        return (vec @ data.ximat[head])[:2]

    def _body_velocities(self, model, data):
        """Local velocimeter (x,y) + gyro (z) per site
        (swimmer.py body_velocities)."""
        out = []
        for s in range(model.nsite):
            b = model.site_body[s]
            R = data.ximat[b]
            v_world = (data.cvel[b, 3:]
                       + jnp.cross(data.cvel[b, :3], data.site_xpos[s]))
            w_world = data.cvel[b, :3]
            v = R.T @ v_world
            w = R.T @ w_world
            out.append(jnp.stack([v[0], v[1], w[2]]))
        return jnp.concatenate(out)

    def get_observation(self, model, phys, data):
        return {
            'joints': phys.qpos[3:],
            'to_target': self._nose_to_target(model, data),
            'body_velocities': self._body_velocities(model, data),
        }

    def get_reward(self, model, phys, data, ctrl):
        tid = model.name2id('geom', 'target')
        target_size = float(np.asarray(model.geom_size)[tid, 0])
        dist = jnp.linalg.norm(self._nose_to_target(model, data))
        return rewards.tolerance(dist, (0, target_size),
                                 margin=5 * target_size,
                                 sigmoid='long_tail')


def _make_swimmer(n, time_limit, environment_kwargs):
    model = mjcf.parse(_make_model_xml(n))
    kwargs = dict(environment_kwargs or {})
    kwargs.setdefault('control_timestep', _CONTROL_TIMESTEP)
    return control.Environment(model, Swimmer(), time_limit=time_limit,
                               **kwargs)


@SUITE.add('benchmarking')
def swimmer6(time_limit=_DEFAULT_TIME_LIMIT, environment_kwargs=None):
    return _make_swimmer(6, time_limit, environment_kwargs)


@SUITE.add('benchmarking')
def swimmer15(time_limit=_DEFAULT_TIME_LIMIT, environment_kwargs=None):
    return _make_swimmer(15, time_limit, environment_kwargs)


def swimmer(n_links=3, time_limit=_DEFAULT_TIME_LIMIT,
            environment_kwargs=None):
    return _make_swimmer(n_links, time_limit, environment_kwargs)
