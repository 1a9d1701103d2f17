"""Data layer: device-resident rollout storage, replay, and normalization.

TPU-native replacement for the reference's host-side containers
(``src/mbrl/data.py``: Rollout / TransitionsDataset / TransitionsSampler).
Rollouts never leave HBM — storage is a fixed-shape ring buffer that jits
into the collect->fit->plan loop, instead of pickled python object lists.
"""

from .replay import (Rollouts, ReplayBuffer, Stats, init_replay, add_rollouts,
                     sample_transitions, gather_windows, epoch_batches,
                     num_transitions, normalize, unnormalize, compute_stats)

__all__ = [
    'Rollouts', 'ReplayBuffer', 'Stats', 'init_replay', 'add_rollouts',
    'sample_transitions', 'gather_windows', 'epoch_batches',
    'num_transitions', 'normalize', 'unnormalize', 'compute_stats',
]
