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
