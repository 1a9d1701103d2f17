"""Task suite: batched-steppable control domains with a dm_control-style API.

Loader contract follows the reference
(``dm_control/dm_control/suite/__init__.py:81-151``):

    env = suite.load('cartpole', 'swingup')
    state, ts = env.reset(jax.random.PRNGKey(0))
    state, ts = env.step(state, action)

Unlike the reference, every environment here is a pure-function pair
(reset/step) over explicit state, so `jax.vmap` steps thousands of
instances in lockstep and `jax.jit` fuses whole rollouts.
"""

from __future__ import annotations

import collections
import importlib
from typing import Optional

from . import base, control, randomizers, registry, rewards
from .control import Environment, EnvState, TimeStep, flatten_observation

_DOMAINS = ('acrobot', 'ball_in_cup', 'cartpole', 'cheetah', 'finger',
            'fish', 'hopper', 'humanoid', 'humanoid_cmu', 'lqr',
            'manipulator', 'pendulum', 'point_mass', 'quadruped',
            'reacher', 'stacker', 'swimmer', 'walker')


def _get_domain(domain_name: str):
    # accept the reference's capitalized spelling (suite.load('humanoid_CMU'))
    domain_name = {'humanoid_CMU': 'humanoid_cmu'}.get(domain_name,
                                                       domain_name)
    return importlib.import_module(
        f'{__package__}.{domain_name}')


def _get_tasks(tag: Optional[str]):
    result = []
    for domain_name in _DOMAINS:
        try:
            domain = _get_domain(domain_name)
        except ImportError:
            continue
        if tag is None:
            tasks_in_domain = domain.SUITE
        else:
            tasks_in_domain = domain.SUITE.tagged(tag)
        for task_name in tasks_in_domain:
            result.append((domain_name, task_name))
    return tuple(result)


def _get_tasks_by_domain(tasks):
    result = collections.defaultdict(list)
    for domain_name, task_name in tasks:
        result[domain_name].append((domain_name, task_name))
    return {k: tuple(v) for k, v in result.items()}


ALL_TASKS = None          # filled lazily by all_tasks()
BENCHMARKING = None


def all_tasks():
    global ALL_TASKS
    if ALL_TASKS is None:
        ALL_TASKS = _get_tasks(tag=None)
    return ALL_TASKS


def benchmarking():
    global BENCHMARKING
    if BENCHMARKING is None:
        BENCHMARKING = _get_tasks('benchmarking')
    return BENCHMARKING


def load(domain_name: str, task_name: str,
         task_kwargs: Optional[dict] = None,
         environment_kwargs: Optional[dict] = None) -> Environment:
    """Build an environment for the given domain/task pair."""
    return build_environment(domain_name, task_name, task_kwargs,
                             environment_kwargs)


def build_environment(domain_name: str, task_name: str,
                      task_kwargs: Optional[dict] = None,
                      environment_kwargs: Optional[dict] = None):
    domain = _get_domain(domain_name)
    if task_name not in domain.SUITE:
        raise ValueError(
            f'Level {task_name!r} does not exist in domain {domain_name!r}.')
    task_kwargs = dict(task_kwargs or {})
    if environment_kwargs is not None:
        task_kwargs['environment_kwargs'] = environment_kwargs
    return domain.SUITE[task_name](**task_kwargs)
