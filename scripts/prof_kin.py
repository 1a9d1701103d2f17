import jax; jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp, numpy as np, time
from mujoco_mbrl_tpu import physics
from mujoco_mbrl_tpu.physics import smooth
from mujoco_mbrl_tpu.suite import humanoid as H, walker as W

for name, xml in [('walker', W._XML), ('humanoid', H._XML)]:
    m = physics.parse(xml)
    meta = smooth.tree_meta(m)
    s = physics.make_state(m)
    fn = jax.jit(lambda q: smooth.kinematics(m, q, meta))
    lowered = fn.lower(s.qpos)
    hlo = lowered.as_text()
    print(f'{name}: nbody={m.nbody} njnt={m.njnt} HLO lines={len(hlo.splitlines())}', flush=True)
    t0=time.time(); c = lowered.compile(); print(f'  compile {time.time()-t0:.1f}s', flush=True)
    out = c(s.qpos); jax.block_until_ready(out)
    t0=time.time()
    for _ in range(20): out = c(s.qpos)
    jax.block_until_ready(out)
    print(f'  run {(time.time()-t0)/20*1000:.1f}ms', flush=True)
