"""Locomotion tasks over composer-lite entities.

* :class:`RunThroughCorridor` — reward the walker for moving at a target
  velocity along the corridor, via the same linear `tolerance` sigmoid
  the reference uses (locomotion/tasks/corridors.py get_reward:
  tolerance(xvel, (v, v), margin=v, sigmoid='linear', value_at_margin=0)).
* :class:`GoToTarget` — sparse reward within `distance_tolerance` of a
  per-episode random target (locomotion/tasks/go_to_target.py); the
  target is a model override (apply_params), matching the suite's
  functional episode-variation pattern.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import composer, variation
from ..suite import rewards
from . import arenas, walkers


class RunThroughCorridor(composer.Task):
    control_timestep = 0.025

    def __init__(self, walker: composer.Entity = None,
                 arena: composer.Entity = None,
                 target_velocity: float = 3.0,
                 terminate_at_height: float = 0.3,
                 walker_spawn_x=None):
        arena = arena or arenas.Corridor()
        super().__init__(arena)
        self.arena = arena
        self.walker = self.attach(walker or walkers.PlanarWalker(),
                                  'walker/')
        self._vel = target_velocity
        self._terminate_at_height = terminate_at_height
        self._spawn_x = walker_spawn_x or variation.Uniform(-0.4, 0.4)

    def initialize_episode(self, model, key):
        from ..physics import make_state
        k1, k2 = jax.random.split(key)
        state = make_state(model)
        jx = model.names['joint']['walker/rootx']
        qpos = state.qpos.at[model.jnt_qposadr[jx]].set(
            self._spawn_x(k1))
        return state.replace(qpos=qpos), ()

    def get_reward(self, model, phys, data, ctrl):
        xvel = self.walker.forward_velocity(model, phys, data)
        return rewards.tolerance(xvel, (self._vel, self._vel),
                                 margin=self._vel, sigmoid='linear',
                                 value_at_margin=0.0)

    def get_termination(self, model, phys, data):
        height = self.walker.torso_height(model, phys, data)
        fell = height < self._terminate_at_height
        return fell, jnp.zeros((), phys.qpos.dtype)


class GoToTarget(composer.Task):
    control_timestep = 0.025

    def __init__(self, walker: composer.Entity = None,
                 arena: composer.Entity = None,
                 distance_tolerance: float = 0.5,
                 target_spawn_range: float = 5.0):
        arena = arena or arenas.Floor()
        super().__init__(arena)
        self.arena = arena
        self.walker = self.attach(walker or walkers.PlanarWalker(),
                                  'walker/')
        self._tol = distance_tolerance
        self._range = target_spawn_range

    def initialize_episode_mjcf(self, root):
        root.worldbody.add('site', name='target', type='sphere',
                           size=[0.1], pos=[0, 0, 0.1])

    def initialize_episode(self, model, key):
        from ..physics import make_state
        k1, k2 = jax.random.split(key)
        target_xy = jax.random.uniform(k1, (2,), minval=-self._range,
                                       maxval=self._range)
        return make_state(model), target_xy

    def apply_params(self, model, params):
        sid = model.names['site']['target']
        return model.replace(
            site_pos=model.site_pos.at[sid, :2].set(params))

    def get_reward(self, model, phys, data, ctrl):
        sid = model.names['site']['target']
        dist = jnp.linalg.norm(
            data.site_xpos[sid, :2]
            - self.walker.root_xy(model, phys, data))
        return (dist < self._tol).astype(phys.qpos.dtype)
