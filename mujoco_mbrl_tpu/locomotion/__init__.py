"""Locomotion-lite: composer-built walkers, arenas, and tasks.

Functional analogue of the reference's ``dm_control/locomotion`` stack
(walkers / arenas / tasks), scoped to the pieces with MBRL value:

* :mod:`arenas` — floor and walled-corridor arenas
  (locomotion/arenas/corridors.py).
* :mod:`walkers` — a planar walker entity with egocentric observables
  (locomotion/walkers/base.py role, built on composer-lite + builder).
* :mod:`tasks` — :class:`tasks.RunThroughCorridor` (target-velocity
  running, locomotion/tasks/corridors.py) and :class:`tasks.GoToTarget`
  (locomotion/tasks/go_to_target.py) with per-episode spawn/target
  variation through the `variation` ops.

Everything compiles to the same pure-function environment as the suite;
soccer / CMU-humanoid remain out of scope (documented non-goals).
"""

from . import arenas, tasks, walkers
from .tasks import GoToTarget, RunThroughCorridor

__all__ = ['arenas', 'tasks', 'walkers', 'GoToTarget',
           'RunThroughCorridor']
