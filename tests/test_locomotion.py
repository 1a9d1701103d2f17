"""Locomotion-lite: corridor running + go-to-target over composer."""

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mbrl_tpu import locomotion


def _rollout(env, key, n=30, ctrl_fn=None):
    state, ts = jax.jit(env.reset)(key)
    spec = env.action_spec()

    def body(carry, k):
        st = carry
        a = (ctrl_fn(k) if ctrl_fn is not None
             else jax.random.uniform(k, spec.shape, minval=-1, maxval=1))
        st, ts = env.step(st, a)
        return st, (ts.reward, st.physics.qpos)

    st, (rew, qpos) = jax.jit(lambda s, ks: jax.lax.scan(body, s, ks))(
        state, jax.random.split(key, n))
    return np.asarray(rew), np.asarray(qpos)


def test_corridor_env_builds_and_runs():
    task = locomotion.RunThroughCorridor(target_velocity=2.0)
    env = locomotion.tasks.composer.make_env(task, time_limit=5.0)
    rew, qpos = _rollout(env, jax.random.PRNGKey(0))
    assert np.isfinite(rew).all() and np.isfinite(qpos).all()
    assert rew.min() >= 0.0 and rew.max() <= 1.0


def test_corridor_reward_tracks_velocity():
    """Reward formula parity: tolerance(xvel, (v, v), margin=v, linear)."""
    task = locomotion.RunThroughCorridor(target_velocity=2.0)
    env = locomotion.tasks.composer.make_env(task)
    m = env.model
    from mujoco_mbrl_tpu.physics import engine, make_state
    jx = m.names['joint']['walker/rootx']
    for xvel, want in ((0.0, 0.0), (1.0, 0.5), (2.0, 1.0), (3.0, 0.5)):
        st = make_state(m)
        st = st.replace(qvel=st.qvel.at[m.jnt_dofadr[jx]].set(xvel))
        data = engine.forward(m, st, jnp.zeros((m.nu,)))
        r = float(task.get_reward(m, st, data, jnp.zeros((m.nu,))))
        np.testing.assert_allclose(r, want, atol=1e-5)


def test_corridor_terminates_on_fall():
    # threshold above the standing height: the first control step must
    # report LAST with discount 0 (termination protocol; the walker
    # standing at 1.3 < 2.0 counts as "fallen")
    task = locomotion.RunThroughCorridor(terminate_at_height=2.0)
    env = locomotion.tasks.composer.make_env(task, time_limit=100.0)
    state, _ = env.reset(jax.random.PRNGKey(0))
    m = env.model
    _, ts = env.step(state, jnp.zeros((m.nu,)))
    assert bool(ts.last())
    assert float(ts.discount) == 0.0
    # and a healthy threshold does NOT terminate
    task2 = locomotion.RunThroughCorridor(terminate_at_height=0.3)
    env2 = locomotion.tasks.composer.make_env(task2, time_limit=100.0)
    state2, _ = env2.reset(jax.random.PRNGKey(0))
    _, ts2 = env2.step(state2, jnp.zeros((env2.model.nu,)))
    assert not bool(ts2.last())


def test_go_to_target_sparse_reward_and_respawn():
    task = locomotion.GoToTarget(distance_tolerance=0.5)
    env = locomotion.tasks.composer.make_env(task)
    m = env.model
    assert 'target' in m.names['site']
    # two different seeds -> different targets (episode params)
    s1, _ = env.reset(jax.random.PRNGKey(1))
    s2, _ = env.reset(jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(s1.params), np.asarray(s2.params))

    # reward is 1 exactly when the walker stands within tolerance
    from mujoco_mbrl_tpu.physics import engine, make_state
    target = np.asarray(s1.params)
    m_ep = task.apply_params(m, s1.params)
    st = make_state(m_ep)
    jx = m.names['joint']['walker/rootx']
    st_near = st.replace(qpos=st.qpos.at[m.jnt_qposadr[jx]].set(
        float(target[0])))
    data = engine.forward(m_ep, st_near, jnp.zeros((m.nu,)))
    r_near = float(task.get_reward(m_ep, st_near, data, jnp.zeros((m.nu,))))
    # walker starts at x=0 y=0; target y may be far -> check both cases
    dist_y = abs(float(target[1]))
    assert r_near == (1.0 if dist_y < 0.5 else 0.0)
    far = st.replace(qpos=st.qpos.at[m.jnt_qposadr[jx]].set(
        float(target[0]) + 3.0))
    data_far = engine.forward(m_ep, far, jnp.zeros((m.nu,)))
    assert float(task.get_reward(m_ep, far, data_far,
                                 jnp.zeros((m.nu,)))) == 0.0


import os as _os
import pytest as _pytest


@_pytest.mark.skipif(_os.environ.get('RUN_HEAVY', '') != '1',
                     reason='62-dof CMU compile is multi-minute on '
                            'XLA:CPU; RUN_HEAVY=1 or TPU backend')
def test_cmu_humanoid_go_to_target_steps():
    """CMU humanoid as a locomotion walker entity: attach to GoToTarget,
    reset, step with zero actions — rewards finite, entity observables
    present (locomotion/walkers/cmu_humanoid.py analogue)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mujoco_mbrl_tpu import locomotion
    from mujoco_mbrl_tpu.locomotion import walkers

    task = locomotion.GoToTarget(walker=walkers.CMUHumanoid())
    env = locomotion.tasks.composer.make_env(task, time_limit=5.0)
    state, ts = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert any('joints_pos' in k for k in ts.observation)
    state, ts = jax.jit(env.step)(state, jnp.zeros(env.model.nu))
    assert np.isfinite(float(ts.reward))
    assert env.model.nu == 56
