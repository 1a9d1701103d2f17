"""Replay buffer + dynamics model tests.

Covers the reference's data-layer contracts (``src/mbrl/data.py``) and the
train-improves-loss smoke test (``src/mbrl/test_train_model.py:24-33``) plus
the normalization cross-check from ``src/test_wrapper_with_dataset.py:55-72``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mujoco_mbrl_tpu import data, models


def _make_rollouts(key, B, T, sd, od, ad):
    ks = jax.random.split(key, 4)
    return data.Rollouts(
        states=jax.random.normal(ks[0], (B, T + 1, sd)),
        observations=jax.random.normal(ks[1], (B, T + 1, od)),
        actions=jax.random.normal(ks[2], (B, T, ad)),
        rewards=jax.random.uniform(ks[3], (B, T)),
    )


class TestReplay:
    def test_add_and_count(self):
        buf = data.init_replay(8, 10, 3, 4, 2)
        rolls = _make_rollouts(jax.random.PRNGKey(0), 3, 10, 3, 4, 2)
        buf = data.add_rollouts(buf, rolls)
        assert int(buf.filled) == 3
        assert int(data.num_transitions(buf)) == 30

    def test_ring_eviction(self):
        """FIFO overwrite when over capacity (data.py:159-183 semantics)."""
        buf = data.init_replay(4, 5, 2, 2, 1)
        r1 = _make_rollouts(jax.random.PRNGKey(1), 3, 5, 2, 2, 1)
        r2 = _make_rollouts(jax.random.PRNGKey(2), 3, 5, 2, 2, 1)
        buf = data.add_rollouts(buf, r1)
        buf = data.add_rollouts(buf, r2)
        assert int(buf.filled) == 4
        assert int(buf.cursor) == 2
        # slot 0 now holds r2's 2nd rollout (wrapped)
        np.testing.assert_array_equal(np.asarray(buf.states[3]),
                                      np.asarray(r2.states[0]))

    def test_stats_match_manual_zscore(self):
        """Normalization math cross-check (test_wrapper_with_dataset.py:55-72)."""
        buf = data.init_replay(4, 6, 3, 3, 2)
        rolls = _make_rollouts(jax.random.PRNGKey(3), 4, 6, 3, 3, 2)
        buf = data.add_rollouts(buf, rolls)
        s = buf.stats['states']
        flat = np.asarray(rolls.states).reshape(-1, 3)
        np.testing.assert_allclose(np.asarray(s.mean), flat.mean(0),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(s.std), flat.std(0, ddof=1),
                                   rtol=1e-3, atol=1e-5)
        np.testing.assert_allclose(np.asarray(s.min), flat.min(0), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(s.max), flat.max(0), rtol=1e-5)
        x = jnp.ones(3)
        z = data.normalize(x, s)
        np.testing.assert_allclose(np.asarray(data.unnormalize(z, s)),
                                   np.asarray(x), rtol=1e-4, atol=1e-5)

    def test_multistep_windows(self):
        buf = data.init_replay(2, 8, 2, 2, 1)
        rolls = _make_rollouts(jax.random.PRNGKey(4), 2, 8, 2, 2, 1)
        buf = data.add_rollouts(buf, rolls)
        win = data.gather_windows(buf, jnp.array([0, 1]), jnp.array([2, 0]),
                                  horizon=3)
        assert win['states'].shape == (2, 3, 2)
        assert win['next_states'].shape == (2, 3, 2)
        # window continuity: next_states[t] == states[t+1]
        np.testing.assert_array_equal(np.asarray(win['states'][0, 1:]),
                                      np.asarray(win['next_states'][0, :-1]))
        np.testing.assert_array_equal(
            np.asarray(win['states'][0]), np.asarray(buf.states[0, 2:5]))

    def test_sampling_jits(self):
        buf = data.init_replay(4, 6, 2, 2, 1)
        buf = data.add_rollouts(
            buf, _make_rollouts(jax.random.PRNGKey(5), 2, 6, 2, 2, 1))
        win = jax.jit(lambda b, k: data.sample_transitions(b, k, 16))(
            buf, jax.random.PRNGKey(0))
        assert win['states'].shape == (16, 1, 2)


def _linear_world_rollouts(key, B, T, sd, ad):
    """Ground-truth linear dynamics s' = A s + B a for learnability tests."""
    kA, kB, ks, ka = jax.random.split(key, 4)
    A = 0.9 * jax.random.orthogonal(kA, sd)
    Bm = jax.random.normal(kB, (ad, sd)) * 0.5
    s0 = jax.random.normal(ks, (B, sd))
    acts = jax.random.normal(ka, (B, T, ad))

    def step(s, a):
        s_next = s @ A.T + a @ Bm
        return s_next, s_next

    def roll(s0, a_seq):
        _, states = jax.lax.scan(step, s0, a_seq)
        return jnp.concatenate([s0[None], states], 0)

    states = jax.vmap(roll)(s0, acts)
    rewards = jnp.zeros((B, T))
    return data.Rollouts(states=states, observations=states,
                         actions=acts, rewards=rewards)


class TestModels:
    def test_train_improves_loss(self):
        """test_train_model.py:24-33: eval MSE must drop after training."""
        buf = data.init_replay(16, 20, 4, 4, 2)
        rolls = _linear_world_rollouts(jax.random.PRNGKey(0), 16, 20, 4, 2)
        buf = data.add_rollouts(buf, rolls)

        model = models.MLPDynamics(4, 2, hidden_units=50)
        params = model.init(jax.random.PRNGKey(1))
        norms = models.train.make_normalizers(buf)

        before = float(models.evaluate_model(
            model, params, buf, jax.random.PRNGKey(2), normalizers=norms))
        params, _, log = jax.jit(
            lambda p, b, k: models.train_model(
                model, p, b, k, batch_size=64, num_epochs=10,
                normalizers=norms),
            static_argnames=())(params, buf, jax.random.PRNGKey(3))
        after = float(models.evaluate_model(
            model, params, buf, jax.random.PRNGKey(2), normalizers=norms))
        assert after < before
        assert np.isfinite(np.asarray(log.losses)).all()

    def test_linear_model_learns_linear_world(self):
        buf = data.init_replay(16, 20, 4, 4, 2)
        buf = data.add_rollouts(
            buf, _linear_world_rollouts(jax.random.PRNGKey(0), 16, 20, 4, 2))
        model = models.LinearDynamics(4, 2)
        params = model.init(jax.random.PRNGKey(1))
        params, _, log = models.train_model(
            model, params, buf, jax.random.PRNGKey(2),
            optimizer=optax.adam(0.03), batch_size=64, num_epochs=30,
            obs_only=False)
        assert float(log.final_loss) < 1e-2

    def test_reward_model_heads(self):
        model = models.RewardDynamics(4, 2, hidden_units=32)
        params = model.init(jax.random.PRNGKey(0))
        s, r = model.forward(params, jnp.ones((7, 4)), jnp.ones((7, 2)))
        assert s.shape == (7, 4) and r.shape == (7, 1)

    def test_ensemble_shapes_and_variance(self):
        base = models.MLPDynamics(3, 1, hidden_units=16)
        ens = models.EnsembleDynamics(base, n_ensemble=4)
        params = ens.init(jax.random.PRNGKey(0))
        s = jnp.ones((5, 3))
        a = jnp.ones((5, 1))
        all_preds = ens.forward_all(params, s, a)
        assert all_preds.shape == (4, 5, 3)
        # members are independently initialized -> distinct predictions
        assert float(jnp.abs(all_preds[0] - all_preds[1]).max()) > 1e-4
        assert ens.forward(params, s, a).shape == (5, 3)

    def test_multistep_training(self):
        buf = data.init_replay(8, 20, 3, 3, 2)
        buf = data.add_rollouts(
            buf, _linear_world_rollouts(jax.random.PRNGKey(0), 8, 20, 3, 2))
        model = models.MLPDynamics(3, 2, hidden_units=32)
        params = model.init(jax.random.PRNGKey(1))
        params, _, log = models.train_model(
            model, params, buf, jax.random.PRNGKey(2), batch_size=32,
            num_epochs=2, horizon=3, obs_only=False)
        assert np.isfinite(float(log.final_loss))


class TestCosts:
    def test_smooth_abs(self):
        w = jnp.ones(3)
        g = jnp.zeros(3)
        at_goal = models.smooth_abs_loss(jnp.zeros(3), g, w)
        away = models.smooth_abs_loss(jnp.ones(3), g, w)
        assert float(at_goal) == pytest.approx(0.0, abs=1e-6)
        assert float(away) > float(at_goal)

    def test_cosh(self):
        assert float(models.cosh_loss(jnp.zeros(2))) == pytest.approx(0.0)
        assert float(models.cosh_loss(jnp.ones(2))) > 0

    def test_state_action_cost_batched(self):
        sc = models.SmoothAbsLoss(weights=jnp.ones(3),
                                  goal_state=jnp.zeros(3))
        ac = models.CoshLoss()
        c = models.state_action_cost(jnp.ones((10, 4, 3)),
                                     jnp.ones((10, 4, 2)), sc, ac)
        assert c.shape == (10, 4)
