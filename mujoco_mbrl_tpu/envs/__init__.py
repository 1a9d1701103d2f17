"""Env adaptation layer: MBRL-facing wrappers over suite environments.

Capability parity with the reference's wrapper layer
(``src/mbrl/env_wrappers.py:10-159``) — `state_dim`, `get_state`,
`sample_state`, `set_goal`, `get_goal_weights`, rollout collection —
re-designed for lockstep SPMD:

* Rollout collection is a jitted `lax.scan` over env steps with a vmapped
  env-batch axis, replacing BOTH the serial loop (env_wrappers.py:100-147)
  and the multiprocessing pool (``src/mbrl/parallel.py:20-52``). One call
  collects N rollouts as one XLA program; there is no pickling and no
  process boundary — trajectories live in HBM.
* Policies are pure functions with an explicit carry (for MPC warm starts)
  instead of stateful objects.
"""

from .wrappers import (EnvWrapper, PointMass, Reacher, Cartpole, Pendulum,
                       load)

__all__ = ['EnvWrapper', 'PointMass', 'Reacher', 'Cartpole', 'Pendulum',
           'load']
