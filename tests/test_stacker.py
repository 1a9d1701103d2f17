"""Stacker domain tests (box props on the manipulator arm).

Also regression-covers jitted reset with per-episode model overrides:
moving a target body makes body_pos a tracer inside jit, which used to
crash the kinematics fast-path predicates (affected manipulator too).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mujoco_mbrl_tpu import suite


@pytest.fixture(scope='module')
def env():
    return suite.load('stacker', 'stack_2')


def test_observation_spec_matches_reference(env):
    state, ts = jax.jit(env.reset)(jax.random.PRNGKey(0))
    obs = ts.observation
    assert obs['arm_pos'].shape == (8, 2)
    assert obs['arm_vel'].shape == (8,)
    assert obs['touch'].shape == (5,)
    assert obs['hand_pos'].shape == (4,)
    assert obs['box_pos'].shape == (2, 4)
    assert obs['box_vel'].shape == (6,)
    assert obs['target_pos'].shape == (2,)


def test_rollout_finite_and_rewarded(env):
    m = env.model
    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(3))

    @jax.jit
    def roll(s, key):
        acts = jax.random.uniform(key, (60, m.nu), minval=-1., maxval=1.)

        def body(st, a):
            st, ts = env.step(st, a)
            return st, ts.reward
        return jax.lax.scan(body, s, acts)

    out, rews = roll(state, jax.random.PRNGKey(4))
    rews = np.asarray(rews)
    assert np.isfinite(rews).all()
    assert (rews >= 0).all() and (rews <= 1).all()
    assert np.isfinite(np.asarray(out.physics.qpos)).all()


def test_target_moves_per_episode(env):
    zs = []
    for seed in range(6):
        state, _ = jax.jit(env.reset)(jax.random.PRNGKey(seed))
        zs.append(float(np.asarray(state.params)[1]))
    # target column height is box_size * (2k+1), k in {0, 1}
    assert set(np.round(zs, 3)) <= {0.022, 0.066}
    assert len(set(np.round(zs, 3))) > 1, 'height should randomize'


def test_manipulator_jitted_reset_regression():
    """Jitted reset of the manipulator (traced target body_pos) must
    compile — it used to raise TracerArrayConversionError."""
    env = suite.load('manipulator', 'bring_ball')
    state, ts = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(state.physics.qpos)).all()
