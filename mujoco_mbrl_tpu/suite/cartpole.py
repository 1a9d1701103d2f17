"""Cartpole domain: balance / balance_sparse / swingup / swingup_sparse
/ two_poles / three_poles.

Task contract transcribed from the reference
(``dm_control/dm_control/suite/cartpole.py``); model constants (geometry,
masses, damping, gear) are task *data* transcribed from the reference's
``cartpole.xml`` so behavior matches — the implementation is new, pure-JAX.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..physics import mjcf
from . import base, control, rewards
from .registry import TaggedTasks

SUITE = TaggedTasks()
_DEFAULT_TIME_LIMIT = 10


def _make_model_xml(n_poles: int = 1) -> str:
    pole_bodies = ''
    inner = ''
    for i in range(1, n_poles + 1):
        inner += (f"<body name='pole_{i}' pos='0 0 {1 if i > 1 else 0}'>"
                  f"<joint name='hinge_{i}' type='hinge' axis='0 1 0'"
                  f" damping='2e-6'/>"
                  f"<geom name='pole_{i}' type='capsule'"
                  f" fromto='0 0 0 0 0 1' size='0.045' mass='.1'/>")
    pole_bodies = inner + '</body>' * n_poles
    return f"""
<mujoco model='cart-pole'>
  <option timestep='0.01' integrator='RK4'>
    <flag contact='disable'/>
  </option>
  <worldbody>
    <camera name='fixed' pos='0 -4 1' zaxis='0 -1 0'/>
    <body name='cart' pos='0 0 1'>
      <joint name='slider' type='slide' limited='true' axis='1 0 0'
             range='-1.8 1.8' solreflimit='.08 1' damping='5e-4'/>
      <geom name='cart' type='box' size='0.2 0.15 0.1' mass='1'/>
      {pole_bodies}
    </body>
  </worldbody>
  <actuator>
    <motor name='slide' joint='slider' gear='10' ctrllimited='true'
           ctrlrange='-1 1'/>
  </actuator>
</mujoco>
"""


class Balance(base.Task):
    """Balance/swing up the pole(s); smooth or sparse reward."""
    # observation/reward read only position/velocity-stage Data
    # -> the per-step observation forward skips the constraint
    # solve (engine.forward acc_stage=False)
    OBSERVES_ACC = False

    _CART_RANGE = (-.25, .25)
    _ANGLE_COSINE_RANGE = (.995, 1)

    def __init__(self, swing_up: bool, sparse: bool, n_poles: int = 1):
        self._swing_up = swing_up
        self._sparse = sparse
        self._n_poles = n_poles

    def initialize_episode(self, model, key):
        from ..physics import make_state
        nv = model.nv
        k1, k2, k3, k4 = jax.random.split(key, 4)
        qpos = jnp.zeros(model.nq)
        if self._swing_up:
            qpos = qpos.at[0].set(.01 * jax.random.normal(k1))
            qpos = qpos.at[1].set(np.pi + .01 * jax.random.normal(k2))
            if nv > 2:
                qpos = qpos.at[2:].set(
                    .1 * jax.random.normal(k3, (nv - 2,)))
        else:
            qpos = qpos.at[0].set(jax.random.uniform(
                k1, (), minval=-.1, maxval=.1))
            qpos = qpos.at[1:].set(jax.random.uniform(
                k2, (nv - 1,), minval=-.034, maxval=.034))
        qvel = 0.01 * jax.random.normal(k4, (nv,))
        return make_state(model, qpos=qpos, qvel=qvel), ()

    # -- physics-derived quantities (cartpole.py Physics class) ----------
    def _pole_angle_cosine(self, data):
        # zz entries of body rotation matrices for all pole bodies (2:)
        return data.ximat[2:, 2, 2]

    def _bounded_position(self, phys, data):
        zz_xz = data.ximat[2:, (2, 0), 2]   # rows: [zz, xz] per pole
        return jnp.concatenate([phys.qpos[0:1], zz_xz.reshape(-1)])

    def get_observation(self, model, phys, data):
        return {
            'position': self._bounded_position(phys, data),
            'velocity': phys.qvel,
        }

    def get_reward(self, model, phys, data, ctrl):
        cart_position = phys.qpos[0]
        if self._sparse:
            cart_in_bounds = rewards.tolerance(cart_position,
                                               self._CART_RANGE)
            angle_in_bounds = rewards.tolerance(
                self._pole_angle_cosine(data),
                self._ANGLE_COSINE_RANGE).prod()
            return cart_in_bounds * angle_in_bounds
        upright = (self._pole_angle_cosine(data) + 1) / 2
        centered = rewards.tolerance(cart_position, margin=2)
        centered = (1 + centered) / 2
        small_control = rewards.tolerance(ctrl, margin=1, value_at_margin=0,
                                          sigmoid='quadratic')[0]
        small_control = (4 + small_control) / 5
        small_velocity = rewards.tolerance(phys.qvel[1:], margin=5).min()
        small_velocity = (1 + small_velocity) / 2
        return upright.mean() * small_control * small_velocity * centered


def _env(swing_up, sparse, n_poles=1, time_limit=_DEFAULT_TIME_LIMIT,
         environment_kwargs=None):
    model = mjcf.parse(_make_model_xml(n_poles))
    task = Balance(swing_up=swing_up, sparse=sparse, n_poles=n_poles)
    return control.Environment(model, task, time_limit=time_limit,
                               **(environment_kwargs or {}))


@SUITE.add('benchmarking')
def balance(time_limit=_DEFAULT_TIME_LIMIT, environment_kwargs=None):
    return _env(False, False, 1, time_limit, environment_kwargs)


@SUITE.add('benchmarking')
def balance_sparse(time_limit=_DEFAULT_TIME_LIMIT, environment_kwargs=None):
    return _env(False, True, 1, time_limit, environment_kwargs)


@SUITE.add('benchmarking')
def swingup(time_limit=_DEFAULT_TIME_LIMIT, environment_kwargs=None):
    return _env(True, False, 1, time_limit, environment_kwargs)


@SUITE.add('benchmarking')
def swingup_sparse(time_limit=_DEFAULT_TIME_LIMIT, environment_kwargs=None):
    return _env(True, True, 1, time_limit, environment_kwargs)


@SUITE.add()
def two_poles(time_limit=_DEFAULT_TIME_LIMIT, environment_kwargs=None):
    return _env(True, False, 2, time_limit, environment_kwargs)


@SUITE.add()
def three_poles(time_limit=_DEFAULT_TIME_LIMIT, environment_kwargs=None):
    return _env(True, False, 3, time_limit, environment_kwargs)
