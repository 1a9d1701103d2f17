"""Task base class for the suite (functional analogue of suite/base.py).

A Task is a bundle of pure functions over ``(Model, State, Data)``. The
reference mutates ``physics`` in-place inside ``initialize_episode``
(``dm_control/dm_control/suite/base.py``); here episode initialization
returns a fresh physics State (and an optional params pytree holding
per-episode model overrides, e.g. a moved target geom).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp

from ..physics import model as M
from ..physics import make_state


class Task:
    """Base task: zero-randomization episode init, pass-through actions."""

    # reward-keyed render highlighting (reference suite/base.py:90-97);
    # read by Environment.render, which blends geom colors toward the
    # highlight tint by reward**4 instead of mutating material rgba
    _visualize_reward = False

    @property
    def visualize_reward(self) -> bool:
        return self._visualize_reward

    @visualize_reward.setter
    def visualize_reward(self, value) -> None:
        if not isinstance(value, bool):
            raise ValueError(
                f'Expected a boolean, got {type(value)}.')
        self._visualize_reward = value

    # Whether get_observation / get_reward / get_termination read any
    # acceleration-stage Data field (qacc, actuator/constraint forces,
    # contact_force via touch/force/torque/accelerometer sensors). Tasks
    # that only read position/velocity-stage products set this False so
    # the per-control-step observation forward skips the actuation model
    # and constraint solve (engine.forward(acc_stage=False)) — the
    # expensive tail of the redundant observation pass. Default True:
    # correct for any task, just not the fast path.
    OBSERVES_ACC = True

    def initialize_episode(self, model: M.Model,
                           key: jax.Array) -> Tuple[M.State, Any]:
        return make_state(model), ()

    def apply_params(self, model: M.Model, params: Any) -> M.Model:
        """Merge per-episode overrides into the model. Default: none."""
        return model

    def before_step(self, action: jnp.ndarray, model: M.Model) -> jnp.ndarray:
        """Map agent action -> ctrl (suite/base.py:77-81)."""
        return action

    def get_observation(self, model: M.Model, phys: M.State, data: M.Data):
        raise NotImplementedError

    def get_reward(self, model: M.Model, phys: M.State, data: M.Data,
                   ctrl: jnp.ndarray):
        raise NotImplementedError
