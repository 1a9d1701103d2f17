"""Inverse kinematics tests (utils/inverse_kinematics.py analogue).

The reference validates qpos_from_site_pose by checking the solved
configuration actually places the site at the target (dm_control
utils/inverse_kinematics_test.py); same contract here, on the swimmer
(planar root + hinge chain, 'head' site).
"""

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mbrl_tpu import suite
from mujoco_mbrl_tpu.physics import ik, smooth


def _swimmer_model():
    env = suite.load('swimmer', 'swimmer6')
    st, _ = env.reset(jax.random.PRNGKey(0))
    return env._model_with(st.params)


def _site_pos(m, qpos, name):
    meta = smooth.tree_meta(m)
    out = smooth.kinematics(m, qpos, meta)
    return np.asarray(out[5][m.name2id('site', name)])


def test_qpos_from_site_pose_reaches_target():
    m = _swimmer_model()
    # a reachable target: pose the swimmer, read the head site, then
    # solve from the reference configuration
    qpos_true = jnp.asarray(m.qpos0).at[0].add(0.15).at[1].add(-0.1)
    qpos_true = qpos_true.at[3].set(0.4)
    target = jnp.asarray(_site_pos(m, qpos_true, 'head'))
    qpos, err = ik.qpos_from_site_pose(
        m, 'head', target, max_steps=100)
    reached = _site_pos(m, qpos, 'head')
    np.testing.assert_allclose(reached, np.asarray(target), atol=2e-3)
    assert float(err) < 2e-3


def test_ik_is_jittable():
    m = _swimmer_model()
    q = jnp.asarray(m.qpos0).at[0].add(0.1)
    target = jnp.asarray(_site_pos(m, q, 'head'))
    solve = jax.jit(lambda t: ik.qpos_from_site_pose(
        m, 'head', t, max_steps=60))
    qpos, err = solve(target)
    assert float(err) < 2e-3
