"""Gradient-descent trajectory optimizer.

Differentiates through the unrolled dynamics model with `jax.grad` (the
reference hand-rolled this with retain_graph backward passes,
planners.py:101-137). Early stopping on mean |action change| uses a
`lax.while_loop` so the iteration count stays data-dependent without
leaving the compiled program.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from .shooting import Trajectory, rollout_actions


def gradient_descent(key: jax.Array, initial_state: jnp.ndarray,
                     model: Callable, cost: Callable,
                     sample_action: Callable, horizon: int,
                     num_iterations: int = 40,
                     stop_condition: float = 0.002,
                     learning_rate: float = 0.01,
                     initial_trajectory: Optional[Trajectory] = None
                     ) -> Trajectory:
    """Adam(lr=0.01) on the action sequence through the unrolled model.

    Defaults mirror GradientDescentPlanner.defaults (planners.py:29):
    40 iterations, stop when mean |delta| < 2e-3.
    """
    if initial_trajectory is None:
        actions = sample_action(key, (horizon,))
    else:
        actions = initial_trajectory.actions

    optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(actions)

    def total_cost(actions):
        states = rollout_actions(model, initial_state, actions)
        return jnp.sum(cost(states, actions))

    grad_fn = jax.grad(total_cost)

    def cond(carry):
        i, _, _, delta = carry
        return jnp.logical_and(i < num_iterations, delta >= stop_condition)

    def body(carry):
        i, actions, opt_state, _ = carry
        g = grad_fn(actions)
        updates, opt_state = optimizer.update(g, opt_state, actions)
        new_actions = optax.apply_updates(actions, updates)
        delta = jnp.mean(jnp.abs(new_actions - actions))
        return i + 1, new_actions, opt_state, delta

    big = jnp.asarray(jnp.inf, actions.dtype)
    _, actions, _, _ = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), actions, opt_state, big))

    states = rollout_actions(model, initial_state, actions)
    traj_states = jnp.concatenate([initial_state[None], states], axis=0)
    return Trajectory(states=traj_states, actions=actions)
