"""FieldIndexer-style named string slicing (index.py:442,590 equivalent).

The reference exposes `physics.named.data.qpos['hinge']` views with ragged
joint spans and column-name indexing; here the same surface resolves to
static gathers at trace time (tests run on the walker + point_mass
models: hinge joints, plus fish for a free-joint ragged span).
"""

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mbrl_tpu import suite
from mujoco_mbrl_tpu.physics import engine, named


def _env_state_data(domain, task):
    env = suite.load(domain, task)
    st, _ = env.reset(jax.random.PRNGKey(0))
    m = env._model_with(st.params)
    data = engine.forward(m, st.physics, jnp.zeros(m.nu), env._contact_fn)
    return env, m, st.physics, data


def test_qpos_qvel_by_joint_name():
    env, m, phys, data = _env_state_data('point_mass', 'easy')
    d = named.indexer(m).bind(state=phys, data=data)
    np.testing.assert_allclose(d.qpos['root_x'], phys.qpos[0])
    np.testing.assert_allclose(d.qpos['root_y'], phys.qpos[1])
    np.testing.assert_allclose(d.qvel[['root_x', 'root_y']], phys.qvel[:2])


def test_ragged_free_joint_span():
    env, m, phys, data = _env_state_data('fish', 'upright')
    d = named.indexer(m).bind(state=phys, data=data)
    root = d.qpos['root']
    assert root.shape == (7,)          # free joint: 3 pos + 4 quat
    np.testing.assert_allclose(root, phys.qpos[:7])
    assert d.qvel['root'].shape == (6,)


def test_column_names_and_lists():
    env, m, phys, data = _env_state_data('walker', 'stand')
    d = named.indexer(m).bind(state=phys, data=data)
    np.testing.assert_allclose(d.xpos['torso'],
                               data.xpos[m.name2id('body', 'torso')])
    z = d.xpos['torso', 'z']
    np.testing.assert_allclose(z, data.xpos[m.name2id('body', 'torso'), 2])
    both = d.xpos[['torso', 'right_leg'], ['x', 'z']]
    assert both.shape == (2, 2)
    zz = d.xmat['torso', 'zz']
    np.testing.assert_allclose(
        zz, data.ximat[m.name2id('body', 'torso'), 2, 2])


def test_inside_jit_is_static():
    env, m, phys, data = _env_state_data('walker', 'stand')

    @jax.jit
    def torso_height(phys, data):
        d = named.indexer(m).bind(state=phys, data=data)
        return d.xpos['torso', 'z']

    np.testing.assert_allclose(torso_height(phys, data),
                               data.xpos[m.name2id('body', 'torso'), 2])


def test_unknown_name_raises():
    env, m, phys, data = _env_state_data('point_mass', 'easy')
    d = named.indexer(m).bind(state=phys, data=data)
    try:
        d.qpos['nonexistent']
    except KeyError as e:
        assert 'nonexistent' in str(e)
    else:
        raise AssertionError('expected KeyError')
