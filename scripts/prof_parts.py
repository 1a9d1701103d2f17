import jax; jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp, numpy as np, time
from mujoco_mbrl_tpu import physics
from mujoco_mbrl_tpu.suite import humanoid as H
from mujoco_mbrl_tpu.physics import collision, smooth, solver, engine

m = physics.parse(H._XML)
s = physics.make_state(m)
meta = smooth.tree_meta(m)
pairs = collision.candidate_pairs(m, include_geom_geom=False)

def smooth_only(s):
    qpos, qvel = s.qpos, s.qvel
    out = smooth.kinematics(m, qpos, meta)
    xpos, xquat, xmat, geom_xpos, geom_xmat, site_xpos, xanchor, xaxis = out
    xipos = smooth.com_positions(m, xpos, xquat)
    cdof = smooth.motion_subspace(m, xquat, xanchor, xaxis, meta)
    cinert = smooth.body_spatial_inertia(m, xquat, xipos)
    qM = smooth.crba(m, cdof, cinert, meta)
    cvel, cdof_dot = smooth.velocities(m, qvel, cdof, meta)
    qfrc_bias = smooth.rnea_bias(m, qvel, cdof, cdof_dot, cvel, cinert, meta, True)
    return qM, qfrc_bias, cdof, geom_xpos, geom_xmat, site_xpos

f1 = jax.jit(smooth_only)
t0=time.time(); out = f1(s); jax.block_until_ready(out); print('smooth compile', round(time.time()-t0,1), flush=True)
t0=time.time()
for _ in range(50): out = f1(s)
jax.block_until_ready(out); print('smooth run x50:', round(time.time()-t0,3), flush=True)

qM, qfrc_bias, cdof, geom_xpos, geom_xmat, site_xpos = out

def solve_only(s, qM, cdof, geom_xpos, geom_xmat, site_xpos):
    qM_chol = jax.scipy.linalg.cho_factor(qM)
    qacc_smooth = jax.scipy.linalg.cho_solve(qM_chol, jnp.zeros(m.nv))
    contact = collision.detect(m, geom_xpos, geom_xmat, pairs)
    cs = solver.assemble(m, meta, s.qpos, s.qvel, cdof, contact, site_xpos)
    qfrc, f = solver.solve(m, cs, qM_chol, qacc_smooth)
    return qfrc

f2 = jax.jit(solve_only)
t0=time.time(); o2 = f2(s, qM, cdof, geom_xpos, geom_xmat, site_xpos); o2.block_until_ready(); print('solver compile', round(time.time()-t0,1), flush=True)
t0=time.time()
for _ in range(50): o2 = f2(s, qM, cdof, geom_xpos, geom_xmat, site_xpos)
o2.block_until_ready(); print('solver run x50:', round(time.time()-t0,3), flush=True)
