"""mujoco_mbrl_tpu: a TPU-native model-based RL framework.

A from-scratch re-design of the capabilities of Khodeir/mujoco-mbrl
(MPC agents + learned dynamics models + trajectory optimizers on
dm_control suite tasks) for TPU hardware: the physics engine, env suite,
replay, model training, and planners are all pure-JAX programs that jit,
vmap, and shard over device meshes.
"""

__version__ = '0.1.0'
