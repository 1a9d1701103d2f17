"""Learned dynamics models, reward heads, and cost modules.

TPU-native replacement for the reference's torch models
(``src/mbrl/models.py``): parameters are plain pytrees, forwards are pure
functions, training steps are optax+jit, ensembles are a vmap axis.
"""

from .dynamics import (MLPDynamics, LinearDynamics, RewardDynamics,
                       EnsembleDynamics, RNNDynamics, Normalizers)
from .train import train_model, evaluate_model, TrainLog
from .costs import (smooth_abs_loss, cosh_loss, quadratic_cost,
                    CostModel, SmoothAbsLoss, CoshLoss, QuadraticCost,
                    state_action_cost)

__all__ = [
    'MLPDynamics', 'LinearDynamics', 'RewardDynamics', 'EnsembleDynamics',
    'RNNDynamics',
    'Normalizers', 'train_model', 'evaluate_model', 'TrainLog',
    'smooth_abs_loss', 'cosh_loss', 'quadratic_cost', 'CostModel',
    'SmoothAbsLoss', 'CoshLoss', 'QuadraticCost', 'state_action_cost',
]
