"""iLQR trajectory optimizer over the learned dynamics model.

The reference's legacy agents carried an iLQR pipeline (historical intent:
``src/mbrl/agents_old.py``, ``src/train-model.py``; compute_jacobian in
``src/mbrl/utils.py:11-31`` existed for it). Here iLQR is a first-class
planner: dynamics are linearized with vmapped `jax.jacobian` over the
nominal trajectory, the backward Riccati recursion is a `lax.scan`, and the
forward pass line-searches a fixed alpha schedule — one jitted program.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .shooting import Trajectory, rollout_actions

_ALPHAS = (1.0, 0.5, 0.25, 0.1, 0.03)


def ilqr(key: jax.Array, initial_state: jnp.ndarray, model: Callable,
         cost: Callable, sample_action: Callable, horizon: int,
         num_iterations: int = 10, reg: float = 1e-6,
         initial_trajectory: Optional[Trajectory] = None) -> Trajectory:
    """Iterative LQR. `cost(states, actions)` is per-step (broadcastable).

    model: (state_dim,), (act_dim,) -> (state_dim,)
    """
    sd = initial_state.shape[-1]
    if initial_trajectory is None:
        actions = sample_action(key, (horizon,))
    else:
        actions = initial_trajectory.actions
    ad = actions.shape[-1]

    def step_cost(s, a):
        return cost(s[None], a[None])[0]

    def total_cost(actions):
        states = rollout_actions(model, initial_state, actions)
        return jnp.sum(cost(states, actions))

    def one_iteration(carry, _):
        actions, prev_cost = carry
        states = rollout_actions(model, initial_state, actions)
        all_states = jnp.concatenate([initial_state[None], states], 0)
        xs = all_states[:-1]                     # (H, sd)

        # --- linearize dynamics + quadraticize cost along the trajectory
        A = jax.vmap(jax.jacfwd(model, argnums=0))(xs, actions)   # (H,sd,sd)
        B = jax.vmap(jax.jacfwd(model, argnums=1))(xs, actions)   # (H,sd,ad)
        cx = jax.vmap(jax.grad(step_cost, argnums=0))(xs, actions)
        cu = jax.vmap(jax.grad(step_cost, argnums=1))(xs, actions)
        cxx = jax.vmap(jax.hessian(step_cost, argnums=0))(xs, actions)
        cuu = jax.vmap(jax.hessian(step_cost, argnums=1))(xs, actions)

        # --- backward Riccati recursion -------------------------------
        def backward(carry, inp):
            Vx, Vxx = carry
            A_t, B_t, cx_t, cu_t, cxx_t, cuu_t = inp
            Qx = cx_t + A_t.T @ Vx
            Qu = cu_t + B_t.T @ Vx
            Qxx = cxx_t + A_t.T @ Vxx @ A_t
            Quu = cuu_t + B_t.T @ Vxx @ B_t + reg * jnp.eye(ad)
            Qux = B_t.T @ Vxx @ A_t
            Quu_inv = jnp.linalg.inv(Quu)
            k_t = -Quu_inv @ Qu
            K_t = -Quu_inv @ Qux
            Vx_new = Qx + K_t.T @ Quu @ k_t + K_t.T @ Qu + Qux.T @ k_t
            Vxx_new = Qxx + K_t.T @ Quu @ K_t + K_t.T @ Qux + Qux.T @ K_t
            Vxx_new = 0.5 * (Vxx_new + Vxx_new.T)
            return (Vx_new, Vxx_new), (k_t, K_t)

        # terminal value: quadratic of the last state's cost-to-go ~ 0
        V0 = (jnp.zeros(sd), jnp.zeros((sd, sd)))
        _, (ks, Ks) = jax.lax.scan(
            backward, V0, (A, B, cx, cu, cxx, cuu), reverse=True)

        # --- forward pass with alpha line search ------------------------
        def forward(alpha):
            def fstep(s, inp):
                a_nom, x_nom, k_t, K_t = inp
                a = a_nom + alpha * k_t + K_t @ (s - x_nom)
                s_next = model(s, a)
                return s_next, a

            _, new_actions = jax.lax.scan(
                fstep, initial_state, (actions, xs, ks, Ks))
            return new_actions, total_cost(new_actions)

        cand_actions, cand_costs = jax.vmap(forward)(
            jnp.asarray(_ALPHAS, actions.dtype))
        best = jnp.argmin(cand_costs)
        best_cost = cand_costs[best]
        improved = best_cost < prev_cost
        new_actions = jnp.where(improved, cand_actions[best], actions)
        return (new_actions, jnp.minimum(best_cost, prev_cost)), best_cost

    init_cost = total_cost(actions)
    (actions, _), _ = jax.lax.scan(
        one_iteration, (actions, init_cost), None, length=num_iterations)

    states = rollout_actions(model, initial_state, actions)
    return Trajectory(
        states=jnp.concatenate([initial_state[None], states], 0),
        actions=actions)
