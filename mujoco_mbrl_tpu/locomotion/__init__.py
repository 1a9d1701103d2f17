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
* :mod:`soccer` — n-vs-n multi-agent soccer (locomotion/soccer):
  walled pitch with goal sensing as a pure function, boxhead-lite
  players, per-player +1/-1 goal rewards, egocentric observables;
  ``soccer.load(team_size)`` mirrors the reference entry point.

Everything compiles to the same pure-function environment as the
suite. The CMU-humanoid walker entity lives in :mod:`walkers`
(``CMUHumanoid``).
"""

from . import arenas, soccer, tasks, walkers
from .tasks import GoToTarget, RunThroughCorridor

__all__ = ['arenas', 'soccer', 'tasks', 'walkers', 'GoToTarget',
           'RunThroughCorridor']
