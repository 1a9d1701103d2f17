"""Identify which constraint rows fire spuriously for humanoid_cmu."""
import os
import sys

import numpy as np

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tests'))

from parity_utils import load_our_env
from mujoco_mbrl_tpu.physics import engine, smooth
from mujoco_mbrl_tpu.physics import model as M
from mujoco_mbrl_tpu.physics import solver as solver_mod

dtype = jnp.float32
fix = np.load('tests/fixtures/parity/humanoid_cmu_stand.npz',
              allow_pickle=False)
env = load_our_env('humanoid_cmu', 'stand')
m = env.model
contact_fn = getattr(env, '_contact_fn', None)
qpos0 = jnp.asarray(fix['p_qpos'][0], dtype)
qvel0 = jnp.asarray(fix['p_qvel'][0], dtype)
ctrl = jnp.asarray(np.asarray(fix['ctrl'])[0], dtype)
state = M.make_state(m, qpos=qpos0, qvel=qvel0, dtype=dtype)


@jax.jit
def probe(s, u):
    d = engine.forward(m, s, u, contact_fn)
    return d


d = probe(state, ctrl)
efc = np.asarray(d.efc_force)
nz = np.nonzero(np.abs(efc) > 1e-9)[0]
print('nonzero efc rows:', nz, 'forces:', efc[nz])

# re-assemble on host to get block labels
meta = smooth.tree_meta(m)
(xpos, xquat, xmat, geom_xpos, geom_xmat, site_xpos, xanchor,
 xaxis) = smooth.kinematics(m, qpos0, meta)
cdof = smooth.motion_subspace(m, xquat, xanchor, xaxis, meta)
from mujoco_mbrl_tpu.physics import collision
contact = None
pairs = collision.candidate_pairs(
    m, include_geom_geom=m.opt.enable_geom_geom_contacts)
if pairs:
    contact = collision.detect(m, geom_xpos, geom_xmat, pairs)
cs = solver_mod.assemble(m, meta, qpos0, qvel0, cdof, contact,
                         site_xpos=site_xpos)
blocks = cs.blocks
print('n blocks:', len(blocks), 'n rows:', cs.J.shape[0])
starts = [i0 for _, i0 in blocks] + [cs.J.shape[0]]
for r in nz:
    # find block containing row r
    bi = max(i for i, (k, i0) in enumerate(blocks) if i0 <= r)
    kind, i0 = blocks[bi]
    print(f'row {r}: block {bi} kind={kind} start={i0} '
          f'aref={np.asarray(cs.aref)[r]:+.4g} '
          f'pos={np.asarray(cs.pos)[r]:+.4g} '
          f'Jrow nonzero dofs={np.nonzero(np.abs(np.asarray(cs.J)[r])>1e-9)[0]}')
# limited joints list with ranges for the femur dofs
lim = solver_mod._limited_joints(m)
names = {v: k for k, v in m.names['joint'].items()}
for i, j in enumerate(lim):
    dadr = m.jnt_dofadr[j]
    if dadr in (6, 7, 8, 13, 14, 15):
        print(f'limited joint {j} ({names.get(j)}) dof {dadr} '
              f'range {np.asarray(m.jnt_range)[j]} '
              f'qpos {np.asarray(qpos0)[m.jnt_qposadr[j]]:+.4f} '
              f'margin {np.asarray(m.jnt_margin)[j]}')
