"""Planner tests on a toy analytic world (no physics needed).

Port of the reference's planner smoke tests
(``src/mbrl/test_random_shooting.py``, ``src/mbrl/test_gradient_planner.py``):
a 1-D world with dynamics s' = s + a and cost |s - goal| — the planner must
steer the state to the goal.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mbrl_tpu import planners

GOAL = 5.0


def toy_model(s, a):
    return s + a


def toy_cost(states, actions):
    return jnp.abs(states[..., 0] - GOAL)


def sample_action(key, batch_shape):
    return jax.random.uniform(key, tuple(batch_shape) + (1,),
                              minval=-1.0, maxval=1.0)


class TestRandomShooting:
    def test_reaches_goal(self):
        traj = jax.jit(lambda k, s: planners.random_shooting(
            k, s, toy_model, toy_cost, sample_action, horizon=10,
            num_trajectories=500))(
            jax.random.PRNGKey(0), jnp.zeros(1))
        assert abs(float(traj.states[-1, 0]) - GOAL) < 1.0
        assert traj.actions.shape == (10, 1)
        assert traj.states.shape == (11, 1)

    def test_warm_start_candidate_kept(self):
        """A perfect warm-start trajectory must never be beaten."""
        perfect = planners.Trajectory(
            states=jnp.cumsum(jnp.full((11, 1), 0.5), 0) - 0.5,
            actions=jnp.full((10, 1), 0.5))
        traj = planners.random_shooting(
            jax.random.PRNGKey(1), jnp.zeros(1), toy_model, toy_cost,
            sample_action, horizon=10, num_trajectories=8,
            initial_trajectory=perfect)
        final_cost = abs(float(traj.states[-1, 0]) - GOAL)
        assert final_cost <= abs(5.0 - 10 * 0.5) + 1e-5


class TestCEM:
    def test_reaches_goal(self):
        traj = jax.jit(lambda k, s: planners.cem(
            k, s, toy_model, toy_cost, horizon=10, action_dim=1,
            num_candidates=300, num_elites=30, num_iterations=5))(
            jax.random.PRNGKey(0), jnp.zeros(1))
        assert abs(float(traj.states[-1, 0]) - GOAL) < 0.8

    def test_beats_random_shooting_on_budget(self):
        """Same sample budget: CEM's final cost <= RS's (it iterates)."""
        key = jax.random.PRNGKey(42)
        rs = planners.random_shooting(key, jnp.zeros(1), toy_model,
                                      toy_cost, sample_action, horizon=10,
                                      num_trajectories=1500)
        ce = planners.cem(key, jnp.zeros(1), toy_model, toy_cost,
                          horizon=10, action_dim=1, num_candidates=300,
                          num_elites=30, num_iterations=5)
        rs_cost = abs(float(rs.states[-1, 0]) - GOAL)
        ce_cost = abs(float(ce.states[-1, 0]) - GOAL)
        assert ce_cost <= rs_cost + 0.2


class TestGradientDescent:
    def test_reaches_goal(self):
        traj = jax.jit(lambda k, s: planners.gradient_descent(
            k, s, toy_model, toy_cost, sample_action, horizon=10,
            num_iterations=200, stop_condition=1e-5, learning_rate=0.1))(
            jax.random.PRNGKey(0), jnp.zeros(1))
        assert abs(float(traj.states[-1, 0]) - GOAL) < 0.5

    def test_early_stop(self):
        """With an immediately-satisfied stop condition, actions barely move."""
        init = planners.Trajectory(
            states=jnp.zeros((11, 1)), actions=jnp.zeros((10, 1)))
        traj = planners.gradient_descent(
            jax.random.PRNGKey(0), jnp.zeros(1), toy_model, toy_cost,
            sample_action, horizon=10, num_iterations=40,
            stop_condition=1e9, initial_trajectory=init)
        # one Adam step of lr=0.01 max
        assert float(jnp.abs(traj.actions).max()) < 0.05


class TestPlannerAPI:
    def test_plan_interface(self):
        for cls in (planners.RandomShootingPlanner, planners.CEMPlanner,
                    planners.GradientDescentPlanner):
            traj = cls.plan(jnp.zeros(1), toy_model, toy_cost,
                            sample_action, horizon=5,
                            key=jax.random.PRNGKey(0))
            assert traj.actions.shape == (5, 1)
            assert traj.states.shape == (6, 1)


class TestCEMBatchedKernelLayouts:
    """The padded / grouped lane decodes in cem_batched's elite refit must
    agree exactly with the plain einsum path (ADVICE r2: the grouped kernel
    is TPU-only, so the layout decode needs CPU-runnable coverage).

    A synthetic sample_costs_fn returns deterministic (costs, actions)
    derived from one known (B, K) reference, re-encoded into each layout
    the fused kernel can hand back:
      * exact:   costs (B, K),  actions (B, H, ad, K)
      * padded:  costs (B, Kp), actions (B, H, ad, Kp), junk in pad lanes
      * grouped: costs (B, Kp), actions (B//G, H, ad, G*Kp)
        with actions_g[bg, h, d, g*Kp + k] = actions_p[bg*G + g, h, d, k]
        (the kernel's grouped-program lane layout, ops/cem_rollout.py).
    """

    B, G, K, Kp, H, AD, E = 4, 2, 6, 8, 3, 2, 2

    def _reference_tensors(self):
        kc, ka = jax.random.split(jax.random.PRNGKey(42))
        costs = jax.random.uniform(kc, (self.B, self.K))
        actions = jax.random.normal(ka, (self.B, self.H, self.AD, self.K))
        return costs, actions

    def _run(self, sample_costs_fn):
        traj = planners.cem_batched(
            jax.random.PRNGKey(0),
            jnp.zeros((self.B, 1)), toy_model, toy_cost,
            horizon=self.H, action_dim=self.AD,
            num_candidates=self.K, num_elites=self.E, num_iterations=2,
            sample_costs_fn=sample_costs_fn, return_states=False)
        return np.asarray(traj.actions)

    def test_padded_and_grouped_match_exact(self):
        costs, actions = self._reference_tensors()
        B, G, K, Kp, H, AD = self.B, self.G, self.K, self.Kp, self.H, self.AD

        # padded layout: junk lanes must never become elites. Give them
        # the most-attractive (lowest) costs so a masking bug shows up.
        pad_costs = jnp.concatenate(
            [costs, jnp.full((B, Kp - K), -1e9)], axis=1)
        pad_actions = jnp.concatenate(
            [actions, jnp.full((B, H, AD, Kp - K), 7.7)], axis=3)

        # grouped layout (B//G programs, G envs interleaved on lanes)
        grouped_actions = pad_actions.reshape(
            B // G, G, H, AD, Kp).transpose(0, 2, 3, 1, 4).reshape(
            B // G, H, AD, G * Kp)

        exact = self._run(lambda seed, mean, std: (costs, actions))
        padded = self._run(lambda seed, mean, std: (pad_costs, pad_actions))
        grouped = self._run(
            lambda seed, mean, std: (pad_costs, grouped_actions))

        np.testing.assert_allclose(padded, exact, rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(grouped, exact, rtol=1e-6, atol=1e-6)

    def test_ensemble_member_blocked_matches_exact(self):
        """Ensemble return_padded contract: 3-tuple (costs (B, n*Kp),
        actions (B, H, ad, n*Kp), True) with member-blocked lanes
        (lane = mi*Kp + q, valid iff q < K/n) and padded-lane costs
        PRE-masked to +max by the kernel
        (ops.mlp_sample_rollout_costs_ensemble(return_padded=True)).
        The trailing True makes cem_batched skip its contiguous lane<K
        mask — which would wrongly kill valid lanes here — and refit the
        buffer as written."""
        B, H, AD = self.B, self.H, self.AD
        n, Kn, Kp = 3, self.K // 3, 4       # K=6 -> 2 per member, pad to 4
        costs, actions = self._reference_tensors()   # (B,K), (B,H,AD,K)
        # exact layout interleaves member k % n; build the member-blocked
        # equivalent: member mi owns candidates q*n + mi. Padded lanes
        # get attractive junk actions (never elite iff pre-mask honored).
        big = np.finfo(np.float32).max
        cb = np.full((B, n * Kp), big, np.float32)
        ab = np.full((B, H, AD, n * Kp), 7.7, np.float32)
        for mi in range(n):
            for q in range(Kn):
                k = q * n + mi
                cb[:, mi * Kp + q] = np.asarray(costs)[:, k]
                ab[:, :, :, mi * Kp + q] = np.asarray(actions)[:, :, :, k]
        exact = self._run(lambda seed, mean, std: (costs, actions))
        blocked = self._run(
            lambda seed, mean, std: (jnp.asarray(cb), jnp.asarray(ab),
                                     True))
        np.testing.assert_allclose(blocked, exact, rtol=1e-6, atol=1e-6)
