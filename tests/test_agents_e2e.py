"""End-to-end agent tests (reference src/mbrl/test_agents.py, made real).

Tiny configurations: the point is exercising the full collect->fit->plan
loop, checkpoint round-trips, and the experiment CLI construction — not
learning curves.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mujoco_mbrl_tpu import agents, envs, models, planners
from mujoco_mbrl_tpu.utils import MetricsWriter


def _make_agent(tmp_path, agent_cls=agents.GoalStateAgent, **overrides):
    env = envs.load('point_mass', 'easy')
    model = models.MLPDynamics(env.observation_dim, env.action_dim,
                               hidden_units=16)
    kwargs = dict(
        environment=env, planner=planners.CEMPlanner, model=model,
        horizon=5, optimizer=optax.adam(0.01), rollout_length=15,
        num_rollouts_per_iteration=2, num_train_iterations=1,
        writer=MetricsWriter(str(tmp_path), use_tensorboard=False),
        base_path=str(tmp_path), seed=0,
        planner_kwargs=dict(num_candidates=64, num_elites=8,
                            num_iterations=2),
        train_epochs=2, train_batch_size=32, num_initial_rollouts=3)
    kwargs.update(overrides)
    if agent_cls is agents.GoalStateAgent:
        return agents.GoalStateAgent(**kwargs)
    return agent_cls(**kwargs)


class TestGoalStateAgent:
    def test_train_loop_runs(self, tmp_path):
        agent = _make_agent(tmp_path)
        agent.train()
        assert int(agent.dataset.filled) == 5   # 3 seed + 2 policy
        metrics = [json.loads(l) for l in
                   open(os.path.join(tmp_path, 'metrics.jsonl'))]
        tags = {m['tag'] for m in metrics}
        assert 'AvgRolloutRewards/random' in tags
        assert 'AvgRolloutRewards/policy' in tags
        assert any('Costs' in t for t in tags)

    def test_checkpoint_roundtrip(self, tmp_path):
        agent = _make_agent(tmp_path)
        agent.train()
        path = os.path.join(tmp_path, 'ckpt')
        agents.save(agent, path)

        agent2 = _make_agent(tmp_path)
        agents.load(agent2, path)
        for a, b in zip(jax.tree_util.tree_leaves(agent.params),
                        jax.tree_util.tree_leaves(agent2.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(agent2.dataset.filled) == int(agent.dataset.filled)
        assert agent2.train_iterations == agent.train_iterations

    def test_get_action(self, tmp_path):
        agent = _make_agent(tmp_path)
        agent._reset_goal()
        agent.add_rollouts(num_rollouts=3,
                           goal_state=agent.training_goal_state)
        obs = jnp.zeros(agent.environment.observation_dim)
        action, carry = agent.get_action(jax.random.PRNGKey(0), obs)
        assert action.shape == (agent.environment.action_dim,)
        assert np.isfinite(np.asarray(action)).all()


class TestRewardAgent:
    def test_train_loop_runs(self, tmp_path):
        env = envs.load('point_mass', 'easy')
        model = models.RewardDynamics(env.observation_dim, env.action_dim,
                                      hidden_units=16)
        agent = _make_agent(tmp_path, agent_cls=agents.RewardAgent,
                            model=model)
        agent.train()
        assert int(agent.dataset.filled) == 5
        obs = jnp.zeros(env.observation_dim)
        action, _ = agent.get_action(jax.random.PRNGKey(0), obs)
        assert np.isfinite(np.asarray(action)).all()


class TestExperimentCLI:
    def test_parse_and_construct(self, tmp_path):
        from mujoco_mbrl_tpu import experiment
        cfg = experiment.parse_args([
            '--exp_dir', str(tmp_path), '--environment', 'point_mass_easy',
            '--agent', 'gs', '--planner', 'rs', '--model', 'lin'])
        assert cfg.horizon == 20
        planner = cfg.planner.construct()
        assert planner is planners.RandomShootingPlanner
        model = cfg.model.construct(cfg.environment)
        assert isinstance(model, models.LinearDynamics)

    def test_all_enum_values_construct(self):
        from mujoco_mbrl_tpu import experiment
        env = envs.load('point_mass', 'easy')
        for p in experiment.Planner:
            assert p.construct() is not None
        for mo in experiment.Model:
            assert mo.construct(env) is not None
        for o in experiment.Optimizer:
            assert o.construct() is not None


class TestStateSpaceGoalAgent:
    """GoalStateAgent on a domain whose goals live in the featured STATE
    space (walker: 20-dim state vs 24-dim obs) — must train/plan in state
    space via the batched CEM policy (the reference left this mismatch as
    a TODO, env_wrappers.py:8, and crashed on such domains)."""

    def test_walker_state_space_training(self, tmp_path):
        env = envs.load('walker', 'stand')
        model = models.MLPDynamics(env.state_dim, env.action_dim,
                                   hidden_units=16)
        agent = agents.GoalStateAgent(
            environment=env, planner=planners.CEMPlanner, model=model,
            horizon=4, optimizer=optax.adam(0.01), rollout_length=8,
            num_rollouts_per_iteration=2, num_train_iterations=1,
            writer=MetricsWriter(str(tmp_path), use_tensorboard=False),
            base_path=str(tmp_path), seed=0,
            planner_kwargs=dict(num_candidates=32, num_elites=4,
                                num_iterations=2),
            train_epochs=1, train_batch_size=16, num_initial_rollouts=2)
        assert agent.obs_only is False
        assert agent.plan_dim == env.state_dim
        agent.train()
        metrics = [json.loads(l) for l in
                   open(os.path.join(tmp_path, 'metrics.jsonl'))]
        tags = {m['tag'] for m in metrics}
        assert 'AvgRolloutRewards/policy' in tags
        assert 'AvgRolloutTotalCosts/policy' in tags
