"""Experiment CLI: config -> agent -> train.

Mirrors the reference entry point (``src/mbrl/experiment.py``):

    python -m mujoco_mbrl_tpu.experiment --exp_dir /tmp/exp \
        --agent gs --environment reacher_easy --planner cem --model nn

Config is a declarative CONFIG_DEF tuple -> argparse (experiment.py:148-159);
enums construct planners/models/optimizers/agents (experiment.py:15-145).
Defaults follow the reference: horizon 20, rollout_length 200, 5 rollouts
per iteration, 10 iterations, Adam lr=0.01.
"""

from __future__ import annotations

import argparse
import os
from enum import Enum

import jax
import numpy as np
import optax

from . import agents, envs, models, planners
from .utils import MetricsWriter, logger


class Planner(Enum):
    RandomShooting = 'rs'
    GradientDescent = 'grad'
    CEM = 'cem'
    ILQR = 'ilqr'

    def __str__(self):
        return self.value

    def construct(self):
        return {
            Planner.RandomShooting: planners.RandomShootingPlanner,
            Planner.GradientDescent: planners.GradientDescentPlanner,
            Planner.CEM: planners.CEMPlanner,
            Planner.ILQR: planners.ILQRPlanner,
        }[self]


class Model(Enum):
    NeuralNet = 'nn'
    Linear = 'lin'
    ModelWithReward = 'rw'
    Ensemble = 'ens'
    RNN = 'rnn'

    def __str__(self):
        return self.value

    def construct(self, environment: envs.EnvWrapper, plan_dim=None):
        od = plan_dim if plan_dim is not None else \
            environment.observation_dim
        ad = environment.action_dim
        if self is Model.NeuralNet:
            return models.MLPDynamics(od, ad)
        if self is Model.Linear:
            return models.LinearDynamics(od, ad)
        if self is Model.ModelWithReward:
            return models.RewardDynamics(od, ad, hidden_units=50)
        if self is Model.Ensemble:
            return models.EnsembleDynamics(
                models.MLPDynamics(od, ad), n_ensemble=5)
        if self is Model.RNN:
            return models.RNNDynamics(od, ad)


class Optimizer(Enum):
    Adam = 'adam'
    SGD = 'sgd'

    def __str__(self):
        return self.value

    def construct(self):
        if self is Optimizer.Adam:
            return optax.adam(0.01)
        return optax.sgd(0.1)


class Agent(Enum):
    GoalStateAgent = 'gs'
    RewardPredictingAgent = 'rw'

    def __str__(self):
        return self.value

    def construct(self, *, environment, planner, model, horizon, optimizer,
                  rollout_length, num_rollouts_per_iteration,
                  num_train_iterations, writer, base_path, seed,
                  planner_kwargs=None, train_epochs=50,
                  kernel_kwargs=None):
        common = dict(
            environment=environment, planner=planner, model=model,
            horizon=horizon, optimizer=optimizer,
            rollout_length=rollout_length,
            num_rollouts_per_iteration=num_rollouts_per_iteration,
            num_train_iterations=num_train_iterations, writer=writer,
            base_path=base_path, seed=seed, planner_kwargs=planner_kwargs,
            train_epochs=train_epochs, kernel_kwargs=kernel_kwargs)
        if self is Agent.GoalStateAgent:
            return agents.GoalStateAgent(
                action_cost=models.CoshLoss(),
                state_cost_weights=environment.get_goal_weights(),
                **common)
        if self is Agent.RewardPredictingAgent:
            return agents.RewardAgent(**common)


def Environment(v: str) -> envs.EnvWrapper:
    try:
        env_name, task_name = v.rsplit('_', 1)
    except ValueError:
        raise argparse.ArgumentTypeError('<env_name>_<task_name>')
    return envs.load(env_name, task_name)


CONFIG_DEF = (
    ('--exp_dir', str, None, 'experiment output directory (required)'),
    ('--agent', Agent, Agent.GoalStateAgent, 'gs | rw'),
    ('--environment', Environment, None, 'e.g. reacher_easy'),
    ('--planner', Planner, Planner.RandomShooting, 'rs | grad | cem'),
    ('--model', Model, Model.NeuralNet, 'nn | lin | rw | ens | rnn'),
    ('--optimizer', Optimizer, Optimizer.Adam, 'adam | sgd'),
    ('--horizon', int, 20, 'planning horizon'),
    ('--rollout_length', int, 200, 'env steps per rollout'),
    ('--num_rollouts_per_iteration', int, 5, ''),
    ('--num_train_iterations', int, 10, ''),
    ('--train_epochs', int, 50, 'model-fit epochs per iteration'),
    ('--seed', int, 0, 'PRNG seed'),
    ('--log_level', str, 'info', 'debug | info | warning'),
    # extensions over the reference CLI (experiment.py:148-159): tuning
    # knobs the reference hard-coded in class defaults
    ('--planner_kwargs', str, '',
     'JSON overrides for the planner, e.g. \'{"num_candidates": 500}\''),
    ('--kernel_kwargs', str, '',
     'JSON static options for the fused TPU sampling kernel, e.g. '
     '\'{"sampler": "triangular"}\''),
)


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    for name, typ, default, help_str in CONFIG_DEF:
        required = default is None
        parser.add_argument(name, type=typ, default=default,
                            required=required, help=help_str)
    return parser.parse_args(argv)


def main(config) -> agents.MPCAgent:
    os.makedirs(config.exp_dir, exist_ok=True)
    with open(os.path.join(config.exp_dir, 'config.txt'), 'w') as f:
        for k, v in sorted(vars(config).items()):
            f.write(f'{k}: {v}\n')
    logger.setup(os.path.join(config.exp_dir, 'experiment.log'),
                 config.log_level)
    writer = MetricsWriter(config.exp_dir)

    environment = config.environment
    planner = config.planner.construct()
    # GoalStateAgent plans in the space the domain's goal lives in (the
    # featured state on locomotion domains); model dims must match.
    plan_dim = (int(environment.get_goal_weights().shape[0])
                if config.agent is Agent.GoalStateAgent else None)
    model = config.model.construct(environment, plan_dim=plan_dim)
    optimizer = config.optimizer.construct()

    import json as _json
    planner_kwargs = (_json.loads(config.planner_kwargs)
                      if getattr(config, 'planner_kwargs', '') else None)
    kernel_kwargs = (_json.loads(config.kernel_kwargs)
                     if getattr(config, 'kernel_kwargs', '') else None)

    agent = config.agent.construct(
        environment=environment, planner=planner, model=model,
        horizon=config.horizon, optimizer=optimizer,
        rollout_length=config.rollout_length,
        num_rollouts_per_iteration=config.num_rollouts_per_iteration,
        num_train_iterations=config.num_train_iterations,
        writer=writer, base_path=config.exp_dir, seed=config.seed,
        train_epochs=config.train_epochs,
        planner_kwargs=planner_kwargs, kernel_kwargs=kernel_kwargs)

    agent.train()
    agents.save(agent, os.path.join(config.exp_dir, 'agent_final'))
    writer.close()
    return agent


if __name__ == '__main__':
    main(parse_args())
