"""Walker base observable suite (locomotion/walkers/base.py:319-495).

Checks the egocentric transforms, IMU-style kinematic sensors derived
from body spatial velocities, end-effector/appendage features, semantic
groupings, and that the off-by-default camera observable stays out of
the task observation dict.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mujoco_mbrl_tpu import composer, locomotion
from mujoco_mbrl_tpu.locomotion import walkers
from mujoco_mbrl_tpu.physics import engine, make_state


def _forward(entity, state_fn=None):
    root = entity.mjcf_model
    root.worldbody.add('geom', name='floor', type='plane',
                       size=[5, 5, 0.1])
    m = root.compile()

    @jax.jit
    def fwd():
        state = make_state(m)
        if state_fn is not None:
            state = state_fn(m, state)
        # position/velocity stages only: every observable under test
        # reads xpos/ximat/cvel, and the full CMU acceleration stage is
        # a multi-minute XLA:CPU compile (the RUN_HEAVY tier's domain)
        return state, engine.forward(m, state, jnp.zeros((m.nu,)), None,
                                     acc_stage=False)

    state, data = fwd()
    return m, state, data


_SLOW = ('egocentric_camera', 'sensors_accelerometer')


def _eval_obs(w, m, state, data):
    """Evaluate all cheap observables in one jit (the heavy enabled=False
    pair — camera render, accelerometer — is covered elsewhere)."""
    fns = {name: fn for name, fn in w.observables().items()
           if name not in _SLOW}

    @jax.jit
    def all_obs():
        return {name: fn(m, state, data) for name, fn in fns.items()}

    return all_obs()


def test_planar_walker_observable_suite():
    w = walkers.PlanarWalker()
    m, state, data = _forward(w)
    obs = _eval_obs(w, m, state, data)
    # base set + planar-specific set are all present
    for name in ('joints_pos', 'joints_vel', 'body_height', 'world_zaxis',
                 'end_effectors_pos', 'sensors_gyro',
                 'sensors_velocimeter', 'position', 'orientation'):
        assert name in obs, name
    assert obs['end_effectors_pos'].shape == (6,)   # 2 feet x 3
    assert obs['world_zaxis'].shape == (3,)
    # at rest: zero velocity sensors, upright world_zaxis = +z
    np.testing.assert_allclose(np.asarray(obs['sensors_gyro']), 0,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(obs['sensors_velocimeter']), 0,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(obs['world_zaxis']), [0, 0, 1],
                               atol=1e-6)
    # groupings name real observables
    for g in (w.proprioception, w.kinematic_sensors):
        for name in g:
            assert name in obs or name in ('sensors_accelerometer',), name
    assert -1.0 <= float(w.aliveness(m, state, data)) <= 0.0


def test_gyro_matches_root_rotation():
    """Spin the walker's planar root hinge; gyro must read the rate
    about the body y axis."""
    w = walkers.PlanarWalker()

    def spin(m, state):
        jy = m.names['joint']['rooty']
        return state.replace(
            qvel=state.qvel.at[m.jnt_dofadr[jy]].set(1.7))

    m, state, data = _forward(w, spin)
    gyro = np.asarray(w.sensors_gyro(m, state, data))
    np.testing.assert_allclose(gyro, [0, 1.7, 0], atol=1e-5)


def test_velocimeter_matches_slide():
    w = walkers.PlanarWalker()

    def slide(m, state):
        jx = m.names['joint']['rootx']
        return state.replace(
            qvel=state.qvel.at[m.jnt_dofadr[jx]].set(0.9))

    m, state, data = _forward(w, slide)
    v = np.asarray(w.sensors_velocimeter(m, state, data))
    np.testing.assert_allclose(v, [0.9, 0, 0], atol=1e-5)


def test_egocentric_transform_roundtrip():
    w = walkers.PlanarWalker()
    m, state, data = _forward(w)
    vec = jnp.array([0.3, -0.2, 1.1])
    ego = w.transform_vec_to_egocentric_frame(m, data, vec)
    # at identity root orientation the transform is the identity
    np.testing.assert_allclose(np.asarray(ego), np.asarray(vec),
                               atol=1e-6)


def test_cmu_walker_structure():
    """Compile-free structural checks (even Model compilation runs a
    jitted kinematics probe for invweight0 — multi-minute on XLA:CPU
    for the 62-dof chain, the RUN_HEAVY tier's domain)."""
    w = walkers.CMUHumanoid()
    root = w.mjcf_model
    assert root.worldbody.find('camera', 'egocentric') is not None
    for n in w.END_EFFECTORS + ('head', 'root'):
        assert root.worldbody.find('body', n) is not None, n
    assert 'appendages_pos' in w.proprioception
    assert {'appendages_pos', 'head_height',
            'end_effectors_pos'} <= set(w.observables())


@pytest.mark.skipif(os.environ.get('RUN_HEAVY', '') != '1',
                    reason='62-dof forward: multi-minute XLA:CPU '
                           'compile; run with RUN_HEAVY=1 / on TPU')
def test_cmu_appendages_and_head():
    w = walkers.CMUHumanoid()
    m, state, data = _forward(w)
    obs = _eval_obs(w, m, state, data)
    assert obs['appendages_pos'].shape == (15,)   # 4 ee + head, x3
    assert obs['end_effectors_pos'].shape == (12,)
    assert float(obs['head_height']) > 0.0


def test_camera_observable_not_in_task_obs():
    """enabled=False observables must not be computed in task envs."""
    task = locomotion.RunThroughCorridor(target_velocity=2.0)
    env = locomotion.tasks.composer.make_env(task, time_limit=5.0)
    state, ts = env.reset(jax.random.PRNGKey(0))
    assert not any('camera' in k or 'accelerometer' in k
                   for k in ts.observation)
    # state stays the plain functional EnvState (no buffer wrapper)
    assert hasattr(state, 'physics')
