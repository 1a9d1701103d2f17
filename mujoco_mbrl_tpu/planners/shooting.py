"""Sampling-based planners: random shooting and CEM.

TPU shape discipline: candidates are a leading batch axis of size K (large,
MXU-friendly), the horizon is a `lax.scan`. Model forwards see (K, dim)
arrays so the 2-layer MLP matmuls tile onto the systolic array; elite
selection is `lax.top_k`. No data-dependent shapes anywhere.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class Trajectory(NamedTuple):
    states: jnp.ndarray    # (H+1, state_dim) — states[0] = initial state
    actions: jnp.ndarray   # (H, action_dim)


def rollout_actions(model: Callable, initial_state: jnp.ndarray,
                    actions: jnp.ndarray) -> jnp.ndarray:
    """Unroll model over a (H, ..., dim) action sequence -> (H, ..., sdim).

    Batch axes broadcast: if actions is (H, K, ad) and initial_state is
    (K, sd) the model is evaluated K-wide per scan step.
    """
    def step(s, a):
        s_next = model(s, a)
        return s_next, s_next

    _, states = jax.lax.scan(step, initial_state, actions)
    return states


def _total_costs(cost: Callable, states: jnp.ndarray,
                 actions: jnp.ndarray) -> jnp.ndarray:
    """Sum per-step costs over the horizon. states/actions: (H, K, dim)."""
    c = cost(states, actions)          # (H, K)
    return c.sum(axis=0)


def random_shooting(key: jax.Array, initial_state: jnp.ndarray,
                    model: Callable, cost: Callable,
                    sample_action: Callable, horizon: int,
                    num_trajectories: int = 1000,
                    initial_trajectory: Optional[Trajectory] = None
                    ) -> Trajectory:
    """K uniform candidate sequences -> batched rollout -> argmin.

    Matches RandomShootingPlanner semantics (planners.py:166-216); the
    warm-start trajectory, when given, replaces one candidate so the
    previous plan is always in the pool (a strict improvement on the
    reference, which discards it for random shooting).
    """
    akey, _ = jax.random.split(key)
    actions = sample_action(akey, (horizon, num_trajectories))
    if initial_trajectory is not None:
        actions = actions.at[:, 0].set(initial_trajectory.actions)

    states0 = jnp.broadcast_to(
        initial_state, (num_trajectories,) + initial_state.shape)
    states = rollout_actions(model, states0, actions)   # (H, K, sd)
    costs = _total_costs(cost, states, actions)         # (K,)
    best = jnp.argmin(costs)
    traj_states = jnp.concatenate(
        [initial_state[None], states[:, best]], axis=0)
    return Trajectory(states=traj_states, actions=actions[:, best])


def cem(key: jax.Array, initial_state: jnp.ndarray, model: Callable,
        cost: Callable, horizon: int,
        action_dim: int,
        num_candidates: int = 1000, num_elites: int = 100,
        num_iterations: int = 5,
        init_mean: Optional[jnp.ndarray] = None,
        init_std: float = 1.0,
        action_low: float = -1.0, action_high: float = 1.0,
        min_std: float = 1e-2, alpha: float = 0.1) -> Trajectory:
    """Cross-entropy method over action sequences.

    Gaussian proposal over the (H, ad) sequence, refit on top-k elites each
    iteration with smoothing `alpha` (mean <- a*old + (1-a)*elite_mean).
    Returns the final elite-mean trajectory re-rolled through the model.
    """
    H, ad, K = horizon, action_dim, num_candidates
    mean = (init_mean if init_mean is not None
            else jnp.zeros((H, ad), initial_state.dtype))
    std = jnp.full((H, ad), init_std, initial_state.dtype)
    states0 = jnp.broadcast_to(initial_state, (K,) + initial_state.shape)

    def iteration(carry, ikey):
        mean, std = carry
        eps = jax.random.normal(ikey, (H, K, ad), initial_state.dtype)
        actions = jnp.clip(mean[:, None] + std[:, None] * eps,
                           action_low, action_high)
        states = rollout_actions(model, states0, actions)
        costs = _total_costs(cost, states, actions)          # (K,)
        _, elite_idx = jax.lax.top_k(-costs, num_elites)
        elite_actions = actions[:, elite_idx]                # (H, E, ad)
        new_mean = elite_actions.mean(axis=1)
        new_std = elite_actions.std(axis=1)
        mean = alpha * mean + (1 - alpha) * new_mean
        std = jnp.maximum(alpha * std + (1 - alpha) * new_std, min_std)
        return (mean, std), None

    (mean, std), _ = jax.lax.scan(
        iteration, (mean, std), jax.random.split(key, num_iterations))

    final_actions = jnp.clip(mean, action_low, action_high)
    final_states = rollout_actions(model, initial_state, final_actions)
    traj_states = jnp.concatenate([initial_state[None], final_states],
                                  axis=0)
    return Trajectory(states=traj_states, actions=final_actions)
