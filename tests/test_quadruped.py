"""Quadruped domain tests: stateful actuators, contacts, observations.

The quadruped exercises engine features no other domain does — filtered
(activation-state) actuators, tendon-equality leg couplings, and the
ellipsoid torso vs plane contact — so it gets targeted coverage beyond
the generic conformance harness (it is RUN_HEAVY-gated there).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mujoco_mbrl_tpu import suite
from mujoco_mbrl_tpu.physics import engine, make_state, mjcf
from mujoco_mbrl_tpu.suite import quadruped


@pytest.fixture(scope='module')
def walk_env():
    return suite.load('quadruped', 'walk')


def test_model_layout(walk_env):
    m = walk_env.model
    assert m.nq == 23 and m.nv == 22          # free root + 16 hinges
    assert m.nu == 12 and m.na == 12          # all actuators filtered
    assert m.ntendon == 12                    # 4x coupling/lift/extend
    assert all(d == 2 for d in m.actuator_dyntype)   # DYN_FILTER


def test_observation_spec_matches_reference(walk_env):
    """Obs shapes must match dm_control quadruped exactly:
    egocentric_state 44 (16 qpos + 16 qvel + 12 act), imu 6,
    force_torque 24 (4 force + 4 torque sensors x 3)."""
    state, ts = jax.jit(walk_env.reset)(jax.random.PRNGKey(0))
    obs = ts.observation
    assert obs['egocentric_state'].shape == (44,)
    assert obs['torso_velocity'].shape == (3,)
    assert obs['torso_upright'].shape == ()
    assert obs['imu'].shape == (6,)
    assert obs['force_torque'].shape == (24,)


def test_stands_on_floor():
    """From the reference pose with zero ctrl the torso must settle on its
    legs, not sink through the floor (regression for APGD conditioning:
    unpreconditioned projected gradient stalled on the stiff tendon
    couplings and the quadruped fell through the plane)."""
    m = mjcf.parse(quadruped._make_xml(10.0))
    s = make_state(m, qpos=jnp.asarray(m.qpos0))

    def roll(s):
        def body(st, _):
            return engine.step(m, st, jnp.zeros(m.nu)), st.qpos[2]
        return jax.lax.scan(body, s, None, length=600)

    _, z = jax.jit(roll)(s)
    z = np.asarray(z)
    assert z.min() > 0.2, f'quadruped sank to z={z.min()}'
    assert abs(z[-1] - z[-100]) < 0.01, 'should settle to rest'


def test_filter_activation_dynamics():
    """act follows first-order filter dynamics: step response of a tau=0.1
    filter over one control step must match exp decay analytically."""
    env = suite.load('quadruped', 'walk')
    m = env.model
    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
    ctrl = jnp.ones(m.nu) * 0.5
    state2, _ = jax.jit(env.step)(state, ctrl)
    # n_substeps = 0.02 / 0.005 = 4 Euler steps of act += h*(c-act)/tau
    a = np.zeros(m.na)
    for _ in range(4):
        a = a + 0.005 * (0.5 - a) / 0.1
    np.testing.assert_allclose(np.asarray(state2.physics.act), a,
                               rtol=1e-5)


def test_reset_is_non_penetrating(walk_env):
    for seed in range(5):
        state, _ = jax.jit(walk_env.reset)(jax.random.PRNGKey(seed))
        d = jax.jit(lambda s: engine.forward(
            walk_env.model, s, jnp.zeros(walk_env.model.nu)))(state.physics)
        assert float(np.asarray(d.contact_dist).min()) > -1e-3, \
            'reset pose must not penetrate the floor'


def test_fetch_ball_contacts():
    env = suite.load('quadruped', 'fetch')
    state, ts = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert 'ball_state' in ts.observation
    assert ts.observation['ball_state'].shape == (9,)
    # ball must come to rest on the floor, not fall through
    def roll(s):
        def body(st, _):
            st, _ts = env.step(st, jnp.zeros(env.model.nu))
            return st, None
        return jax.lax.scan(body, s, None, length=150)[0]
    out = jax.jit(roll)(state)
    ball = env.model.jnt_qpos_slice('ball_root')
    z = float(out.physics.qpos[ball.start + 2])
    assert 0.1 < z < 0.3, f'ball should rest at radius height, z={z}'
