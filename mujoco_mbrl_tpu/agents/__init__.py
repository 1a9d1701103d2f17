"""MPC agents: the outer MBRL loop.

Capability parity with the reference's agent layer (``src/mbrl/agents.py``):
MPCPolicy (warm-started receding-horizon control), MPCAgent scaffolding,
GoalStateAgent (hand-built goal costs), RewardAgent (learned reward head).
"""

from .mpc import MPCPolicy, MPCAgent, GoalStateAgent, RewardAgent, save, load

__all__ = ['MPCPolicy', 'MPCAgent', 'GoalStateAgent', 'RewardAgent',
           'save', 'load']
