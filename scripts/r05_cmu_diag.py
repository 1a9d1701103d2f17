"""Round-5 humanoid_cmu diagnosis: single-step comparison vs oracle.

From the oracle's recorded physics state at step k, take ONE engine step
and compare (qpos, qvel) against the oracle's step k+1. Prints our
constraint forces at that state (oracle says nefc=0 there) and runs at
the dtype chosen by DIAG_DTYPE (float32/float64) so precision vs
modeling bugs separate cleanly.
"""
import os
import sys

import numpy as np

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
if os.environ.get('DIAG_DTYPE', 'float32') == 'float64':
    os.environ['JAX_ENABLE_X64'] = '1'

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tests'))

from parity_utils import load_our_env
from mujoco_mbrl_tpu.physics import engine
from mujoco_mbrl_tpu.physics import model as M

dtype = jnp.float64 if os.environ.get('DIAG_DTYPE') == 'float64' \
    else jnp.float32

fix = np.load('tests/fixtures/parity/humanoid_cmu_stand.npz',
              allow_pickle=False)
env = load_our_env('humanoid_cmu', 'stand')
m = env.model
nsub = int(fix['n_sub_steps'])
contact_fn = getattr(env, '_contact_fn', None)

k = int(os.environ.get('DIAG_STEP', '0'))
qpos0 = np.asarray(fix['p_qpos'][k])
qvel0 = np.asarray(fix['p_qvel'][k])
qpos1 = np.asarray(fix['p_qpos'][k + 1])
qvel1 = np.asarray(fix['p_qvel'][k + 1])
ctrl = np.asarray(fix['ctrl'])[k // nsub]

state = M.make_state(m, qpos=jnp.asarray(qpos0, dtype),
                     qvel=jnp.asarray(qvel0, dtype), dtype=dtype)


@jax.jit
def one(s, u):
    d = engine.forward(m, s, u, contact_fn)
    s2 = engine.step(m, s, u, contact_fn)
    return d, s2


d, s2 = one(state, jnp.asarray(ctrl, dtype))
qf = np.asarray(d.qfrc_constraint)
efc = np.asarray(d.efc_force) if d.efc_force is not None else np.zeros(0)
print(f'dtype={dtype.__name__} step k={k}')
print(f'our qfrc_constraint: max|f|={np.abs(qf).max():.4g} '
      f'nonzero_rows(efc)={int((np.abs(efc) > 1e-9).sum())}/{efc.shape}')
top = np.argsort(-np.abs(qf))[:6]
for i in top:
    print(f'  qfrc_constraint[{i}] = {qf[i]:+.4f}')
dq = np.abs(np.asarray(s2.qpos) - qpos1)
dv = np.abs(np.asarray(s2.qvel) - qvel1)
print(f'post-step: max|dqpos|={dq.max():.4g} at {dq.argmax()}, '
      f'max|dqvel|={dv.max():.4g} at {dv.argmax()}')
iv = int(dv.argmax())
print(f'  qvel[{iv}]: ours {np.asarray(s2.qvel)[iv]:+.4f} '
      f'oracle {qvel1[iv]:+.4f} start {qvel0[iv]:+.4f}')
# roll a few more steps from oracle states to see the per-step error growth
for kk in range(k, min(k + 8, fix['p_qpos'].shape[0] - 1)):
    st = M.make_state(m, qpos=jnp.asarray(fix['p_qpos'][kk], dtype),
                      qvel=jnp.asarray(fix['p_qvel'][kk], dtype),
                      dtype=dtype)
    _, s2 = one(st, jnp.asarray(np.asarray(fix['ctrl'])[kk // nsub], dtype))
    dv = np.abs(np.asarray(s2.qvel) - np.asarray(fix['p_qvel'][kk + 1]))
    print(f'  from oracle step {kk}: one-step max|dqvel|={dv.max():.4g} '
          f'at dof {dv.argmax()}')
