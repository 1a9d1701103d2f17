"""LQR analytic-oracle test: exact ground truth for dynamics + control.

Port of the reference's oracle test (``suite/tests/lqr_test.py:43-54``): the
DARE-optimal linear policy u = Kx, computed from OUR compiled model's mass
matrix, must stabilize OUR simulated system at the predicted geometric rate.
This cross-validates the MJCF compiler, CRBA, actuation, springs, and the
semi-implicit Euler integrator end-to-end against closed-form control theory.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mujoco_mbrl_tpu import suite
from mujoco_mbrl_tpu.suite import lqr_solver


@pytest.mark.parametrize('task', ['lqr_2_1', 'lqr_6_2'])
def test_optimal_policy_stabilizes(task):
    env = suite.load('lqr', task, task_kwargs={'seed': 0})
    p, k, beta = lqr_solver.solve(env)
    assert beta < 1.0

    state, ts = jax.jit(env.reset)(jax.random.PRNGKey(0))
    k_jnp = jnp.asarray(k, dtype=jnp.float32)

    def body(s, _):
        x = jnp.concatenate([s.physics.qpos, s.physics.qvel])
        u = k_jnp @ x
        s, ts = env.step(s, u)
        return s, jnp.linalg.norm(x)

    n_steps = 300
    final, norms = jax.jit(
        lambda s: jax.lax.scan(body, s, None, n_steps))(state)
    norms = np.asarray(norms)

    # geometric decay at rate ~beta (2x slack for f32 + discretization)
    assert norms[-1] < norms[0] * max(beta ** n_steps * 2.0, 2e-3), (
        norms[0], norms[-1], beta)
    # and strictly contracted overall
    assert norms[-1] < norms[0]


def test_value_function_predicts_cost():
    """Total incurred quadratic cost ~ V(x0) = 0.5 x0' P x0."""
    env = suite.load('lqr', 'lqr_2_1', task_kwargs={'seed': 1})
    p, k, beta = lqr_solver.solve(env)
    state, ts = jax.jit(env.reset)(jax.random.PRNGKey(2))
    x0 = np.concatenate([np.asarray(state.physics.qpos),
                         np.asarray(state.physics.qvel)])
    predicted = 0.5 * x0 @ p @ x0

    k_jnp = jnp.asarray(k, dtype=jnp.float32)
    c = env.task.control_cost_coef

    def body(s, _):
        x = jnp.concatenate([s.physics.qpos, s.physics.qvel])
        u = k_jnp @ x
        cost = 0.5 * (s.physics.qpos @ s.physics.qpos) + 0.5 * c * (u @ u)
        s, _ = env.step(s, u)
        return s, cost

    _, costs = jax.jit(lambda s: jax.lax.scan(body, s, None, 400))(state)
    total = float(np.asarray(costs).sum())
    # Riccati P uses q = diag(ones(n), zeros(n)) on [pos, vel]: position-only
    # cost; allow 25% tolerance for f32 + discretization mismatch.
    assert abs(total - predicted) / predicted < 0.25, (total, predicted)


def test_termination_on_converged_state():
    env = suite.load('lqr', 'lqr_2_1', task_kwargs={'seed': 0})
    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
    tiny = state.replace(physics=state.physics.replace(
        qpos=jnp.zeros_like(state.physics.qpos) + 1e-8,
        qvel=jnp.zeros_like(state.physics.qvel)))
    new_state, ts = jax.jit(env.step)(tiny, jnp.zeros(env.model.nu))
    assert int(ts.step_type) == suite.control.LAST
    assert float(ts.discount) == 0.0
