"""Cost modules for goal-state planning.

jnp ports of the reference's cost zoo (``src/mbrl/models.py:220-288``):
smooth-abs state cost, cosh action cost, quadratic cost, and a learned
CostModel MLP. Functional forms are provided both as plain functions and as
thin classes matching the reference's `set_goal_state` protocol
(models.py:233-238) so agents can re-target costs per episode.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from .dynamics import _dense, _dense_init


def smooth_abs_loss(x, goal_state, weights, alpha: float = 0.4):
    """sum(sqrt((w*(x-g))^2 + a^2) - a): interpolates L1<->L2
    (models.py:244-259)."""
    d = (x - goal_state) * weights
    return jnp.sum(jnp.sqrt(d * d + alpha * alpha) - alpha, axis=-1)


def cosh_loss(u, alpha: float = 0.25):
    """alpha^2 * mean(cosh(u/alpha) - 1): control-limiting action cost
    (models.py:262-272)."""
    return (alpha ** 2) * jnp.mean(jnp.cosh(u / alpha) - 1, axis=-1)


def quadratic_cost(x, goal_state, Q):
    """(x-g)^T Q (x-g) (models.py:275-288, with its self.goalState typo
    fixed)."""
    d = x - goal_state
    return jnp.einsum('...i,ij,...j->...', d, Q, d)


def state_action_cost(state, action, state_cost, action_cost):
    """agents.py:182: total planning cost."""
    return state_cost(state) + action_cost(action)


class StateCost:
    """Base for goal-conditioned state costs (models.py:233-238)."""
    goal_state: Optional[jnp.ndarray] = None

    def set_goal_state(self, goal_state):
        self.goal_state = goal_state


class SmoothAbsLoss(StateCost):
    def __init__(self, weights, goal_state=None, alpha: float = 0.4):
        self.weights = weights
        self.goal_state = goal_state
        self.alpha = alpha

    def __call__(self, x):
        return smooth_abs_loss(x, self.goal_state, self.weights, self.alpha)


class CoshLoss:
    def __init__(self, alpha: float = 0.25):
        self.alpha = alpha

    def __call__(self, u):
        return cosh_loss(u, self.alpha)


class QuadraticCost(StateCost):
    def __init__(self, dim: int, goal_state=None, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        self.Q = jax.random.uniform(key, (dim, dim)) / dim
        self.goal_state = goal_state

    def __call__(self, x):
        return quadratic_cost(x, self.goal_state, self.Q)


class CostModel:
    """Learned cost MLP c(s, a) (models.py:220-230)."""

    def __init__(self, state_dim: int, action_dim: int,
                 hidden_units: int = 70, dtype=jnp.float32):
        self.state_dim = state_dim
        self.action_dim = action_dim
        self.hidden_units = hidden_units
        self.dtype = dtype

    def init(self, key: jax.Array) -> Dict[str, Any]:
        k1, k2, k3 = jax.random.split(key, 3)
        h = self.hidden_units
        return {
            'l1': _dense_init(k1, self.state_dim + self.action_dim, h,
                              self.dtype),
            'l2': _dense_init(k2, h, h, self.dtype),
            'l3': _dense_init(k3, h, 1, self.dtype),
        }

    def forward(self, params, state, action):
        x = jnp.concatenate([state, action], axis=-1)
        x = jax.nn.relu(_dense(params['l1'], x))
        x = jax.nn.relu(_dense(params['l2'], x))
        return _dense(params['l3'], x)
