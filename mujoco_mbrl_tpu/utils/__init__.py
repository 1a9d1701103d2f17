"""Observability + persistence utilities.

Replaces the reference's logger/tensorboardX/Recorder/pickle stack
(``src/mbrl/logger.py``, ``src/mbrl/utils.py``, agents.py:22-27) with:
logger singleton, a jsonl+TensorBoard metrics writer, pytree
checkpointing, profiling helpers, and a rollout video recorder.
"""

from .logger import logger
from .metrics import MetricsWriter
from .checkpoint import save_pytree, load_pytree
from .recorder import Recorder
from .jacobian import compute_jacobian
from . import render

__all__ = ['logger', 'MetricsWriter', 'save_pytree', 'load_pytree',
           'Recorder', 'compute_jacobian', 'render']
