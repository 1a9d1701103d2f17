import jax; jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp, time
from mujoco_mbrl_tpu import physics
from mujoco_mbrl_tpu.suite import humanoid as H

m = physics.parse(H._XML)
s = physics.make_state(m)
step = jax.jit(lambda s, c: physics.step(m, s, c))
t0=time.time(); s2 = step(s, jnp.zeros(m.nu)); s2.qpos.block_until_ready()
print('step compile', round(time.time()-t0,1), flush=True)
t0=time.time()
for _ in range(100): s2 = step(s2, jnp.zeros(m.nu))
s2.qpos.block_until_ready()
print('100 steps:', round(time.time()-t0,2), 's ->', round((time.time()-t0)*10,1), 'ms/step', flush=True)
import numpy as np
print('qpos finite:', np.isfinite(np.asarray(s2.qpos)).all(), 'root z:', float(s2.qpos[2]))
