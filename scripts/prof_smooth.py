import jax; jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp, numpy as np, time
from mujoco_mbrl_tpu import physics
from mujoco_mbrl_tpu.suite import humanoid as H
from mujoco_mbrl_tpu.physics import smooth

m = physics.parse(H._XML)
s = physics.make_state(m)
meta = smooth.tree_meta(m)

def timeit(name, fn, *args, n=30):
    f = jax.jit(fn)
    t0=time.time(); out = f(*args); jax.block_until_ready(out)
    c = time.time()-t0
    t0=time.time()
    for _ in range(n): out = f(*args)
    jax.block_until_ready(out)
    print(f'{name}: compile {c:.1f}s run {(time.time()-t0)/n*1000:.1f}ms', flush=True)
    return out

kin = timeit('kinematics', lambda q: smooth.kinematics(m, q, meta), s.qpos)
xpos, xquat, xmat, geom_xpos, geom_xmat, site_xpos, xanchor, xaxis = kin
xipos = timeit('com_positions', lambda a,b: smooth.com_positions(m,a,b), xpos, xquat)
cdof = timeit('motion_subspace', lambda a,b,c: smooth.motion_subspace(m,a,b,c,meta), xquat, xanchor, xaxis)
cinert = timeit('spatial_inertia', lambda a,b: smooth.body_spatial_inertia(m,a,b), xquat, xipos)
qM = timeit('crba', lambda a,b: smooth.crba(m,a,b,meta), cdof, cinert)
cv = timeit('velocities', lambda v,c: smooth.velocities(m,v,c,meta), s.qvel, cdof)
cvel, cdof_dot = cv
_ = timeit('rnea', lambda a,b,c,d,e: smooth.rnea_bias(m,a,b,c,d,e,meta,True), s.qvel, cdof, cdof_dot, cvel, cinert)
