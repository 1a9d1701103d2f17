"""Class-style planner API matching the reference's ModelPlanner protocol.

``plan(initial_state, model, cost, sample_action, horizon,
initial_trajectory=None, key=..., **kwargs) -> (states, actions)``
(reference ``src/mbrl/planners.py:14-25``), with an explicit PRNG key in
place of the reference's hidden global RNG state. Instances are stateless;
`plan` is a pure function so MPC policies jit it.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from . import gradient, shooting
from .shooting import Trajectory


class ModelPlanner:
    defaults: dict = {}

    @classmethod
    def plan(cls, initial_state, model, cost, sample_action, horizon,
             initial_trajectory=None, key=None, **kwargs) -> Trajectory:
        raise NotImplementedError


class RandomShootingPlanner(ModelPlanner):
    defaults = dict(num_trajectories=1000)

    @classmethod
    def plan(cls, initial_state, model, cost, sample_action, horizon,
             initial_trajectory=None, key=None, **kwargs) -> Trajectory:
        key = key if key is not None else jax.random.PRNGKey(0)
        num_trajectories = kwargs.get('num_trajectories',
                                      cls.defaults['num_trajectories'])
        return shooting.random_shooting(
            key, initial_state, model, cost, sample_action, horizon,
            num_trajectories=num_trajectories,
            initial_trajectory=initial_trajectory)


class CEMPlanner(ModelPlanner):
    defaults = dict(num_candidates=1000, num_elites=100, num_iterations=5,
                    action_low=-1.0, action_high=1.0)

    @classmethod
    def plan(cls, initial_state, model, cost, sample_action, horizon,
             initial_trajectory=None, key=None, **kwargs) -> Trajectory:
        key = key if key is not None else jax.random.PRNGKey(0)
        cfg = {**cls.defaults, **kwargs}
        init_mean = (initial_trajectory.actions
                     if initial_trajectory is not None else None)
        action_dim = kwargs.get('action_dim')
        if action_dim is None:
            probe = sample_action(key, (1,))
            action_dim = probe.shape[-1]
        return shooting.cem(
            key, initial_state, model, cost, horizon, action_dim,
            num_candidates=cfg['num_candidates'],
            num_elites=cfg['num_elites'],
            num_iterations=cfg['num_iterations'],
            init_mean=init_mean,
            action_low=cfg['action_low'], action_high=cfg['action_high'])


class GradientDescentPlanner(ModelPlanner):
    defaults = dict(num_iterations=40, stop_condition=0.002)

    @classmethod
    def plan(cls, initial_state, model, cost, sample_action, horizon,
             initial_trajectory=None, key=None, **kwargs) -> Trajectory:
        key = key if key is not None else jax.random.PRNGKey(0)
        cfg = {**cls.defaults, **kwargs}
        return gradient.gradient_descent(
            key, initial_state, model, cost, sample_action, horizon,
            num_iterations=cfg['num_iterations'],
            stop_condition=cfg['stop_condition'],
            initial_trajectory=initial_trajectory)


class ILQRPlanner(ModelPlanner):
    defaults = dict(num_iterations=10)

    @classmethod
    def plan(cls, initial_state, model, cost, sample_action, horizon,
             initial_trajectory=None, key=None, **kwargs) -> Trajectory:
        from . import ilqr as _ilqr
        key = key if key is not None else jax.random.PRNGKey(0)
        cfg = {**cls.defaults, **kwargs}
        return _ilqr.ilqr(
            key, initial_state, model, cost, sample_action, horizon,
            num_iterations=cfg['num_iterations'],
            initial_trajectory=initial_trajectory)
