"""TPU-native physics engine: MJCF-subset compiler + pure-JAX dynamics.

Replaces the reference's native MuJoCo path (libmujoco.so via ctypes,
reference ``dm_control/dm_control/mujoco/``) with a functional pipeline:

    model = mjcf.parse(xml_string)          # ahead-of-time compile
    state = make_state(model)               # {qpos, qvel, time} pytree
    state = engine.step(model, state, ctrl) # jit/vmap/scan-safe
"""

from . import engine, math, mjcf, model, smooth
from .engine import forward, n_substeps, step, substep
from .mjcf import parse
from .model import Data, Model, Option, State, make_state

__all__ = [
    'engine', 'math', 'mjcf', 'model', 'smooth',
    'forward', 'step', 'substep', 'n_substeps', 'parse',
    'Data', 'Model', 'Option', 'State', 'make_state',
]
