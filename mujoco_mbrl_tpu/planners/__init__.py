"""Trajectory-optimization planners.

Capability parity with the reference planner zoo (``src/mbrl/planners.py``)
plus CEM:

* :func:`random_shooting`  — K candidate action sequences, batched model
  rollout, argmin total cost (planners.py:140-216). The reference loops
  Python over the horizon with a K-wide torch batch; here the horizon is a
  `lax.scan` and candidates are a vmapped batch axis, so one jitted kernel
  evaluates all K*H model forwards on the MXU.
* :func:`cem` — cross-entropy method with top-k elite refitting (random
  shooting == cem with one iteration and uniform proposals).
* :func:`gradient_descent` — Adam on the action sequence through the
  differentiable unrolled model, with the reference's early-stop rule
  (planners.py:28-137: lr=0.01, 40 iters, stop when mean |delta action|
  < 2e-3) implemented as a `lax.while_loop`.

All planners are pure functions of (key, initial_state, model, cost, ...)
and return `(states, actions)` trajectories like ModelPlanner.plan
(planners.py:14-25).
"""

from .shooting import Trajectory, random_shooting, cem, cem_batched
from .gradient import gradient_descent
from .ilqr import ilqr
from .api import (ModelPlanner, RandomShootingPlanner, CEMPlanner,
                  GradientDescentPlanner, ILQRPlanner)

__all__ = [
    'Trajectory', 'random_shooting', 'cem', 'cem_batched',
    'gradient_descent', 'ilqr',
    'ModelPlanner', 'RandomShootingPlanner', 'CEMPlanner',
    'GradientDescentPlanner', 'ILQRPlanner',
]
