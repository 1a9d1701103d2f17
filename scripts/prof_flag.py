import os
os.environ['XLA_FLAGS'] = os.environ.get('XLA_FLAGS','') + ' --xla_cpu_use_thunk_runtime=false'
import jax; jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp, time
from mujoco_mbrl_tpu import physics
from mujoco_mbrl_tpu.physics import smooth
from mujoco_mbrl_tpu.suite import humanoid as H

m = physics.parse(H._XML)
meta = smooth.tree_meta(m)
s = physics.make_state(m)
fn = jax.jit(lambda q: smooth.kinematics(m, q, meta))
t0=time.time(); out = fn(s.qpos); jax.block_until_ready(out)
print('compile', round(time.time()-t0,1), flush=True)
t0=time.time()
for _ in range(20): out = fn(s.qpos)
jax.block_until_ready(out)
print('run', round((time.time()-t0)/20*1000,2), 'ms', flush=True)
