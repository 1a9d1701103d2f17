"""Heightfield terrain tests: bilinear sampling, contacts, escape task."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mujoco_mbrl_tpu import physics, suite
from mujoco_mbrl_tpu.physics import collision, engine

_XML = """
<mujoco model='hf'>
  <option timestep='0.002'/>
  <asset><hfield name='terrain' nrow='9' ncol='9' size='2 2 1 .1'/></asset>
  <worldbody>
    <geom name='terrain' type='hfield' pos='0 0 0'/>
    <body name='ball' pos='0.3 0.2 1.5'>
      <joint type='free'/>
      <geom name='ball' type='sphere' size='0.1' mass='1' friction='0.8'/>
    </body>
  </worldbody>
</mujoco>
"""


def test_height_and_normal_on_ramp():
    m = physics.parse(_XML)
    data = jnp.tile(jnp.linspace(0, 1, 9)[None, :], (9, 1))
    m = m.replace(hfield_data=data)
    h, n = collision.hfield_height_normal(m, jnp.asarray(0.0),
                                          jnp.asarray(0.0))
    assert float(h) == pytest.approx(0.5, abs=1e-5)
    # slope dh/dx = z_top / (2 * rx) * 2 = 0.25 -> n ~ [-0.2425, 0, 0.970]
    np.testing.assert_allclose(np.asarray(n), [-0.24254, 0.0, 0.97014],
                               atol=1e-4)


def test_ball_rests_on_terrain():
    m = physics.parse(_XML)
    m = m.replace(hfield_data=jnp.full((9, 9), 0.5))
    s = physics.make_state(m)

    def roll(s):
        def body(st, _):
            return engine.step(m, st, jnp.zeros(m.nu)), None
        return jax.lax.scan(body, s, None, length=800)[0]

    out = jax.jit(roll)(s)
    # terrain height 0.5 * z_top(1) = 0.5; ball radius 0.1
    assert float(out.qpos[2]) == pytest.approx(0.6, abs=0.01)


def test_escape_task():
    env = suite.load('quadruped', 'escape')
    state, ts = jax.jit(env.reset)(jax.random.PRNGKey(0))
    obs = ts.observation
    assert obs['rangefinder'].shape == (20,)
    assert obs['origin'].shape == (3,)
    rf = np.asarray(obs['rangefinder'])
    assert ((-1 <= rf) & (rf <= 1)).all()
    assert np.asarray(state.params).shape == (201, 201)   # terrain
    # terrains differ per episode
    state2, _ = jax.jit(env.reset)(jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(state.params),
                           np.asarray(state2.params))
    state3, ts3 = jax.jit(env.step)(state, jnp.zeros(env.model.nu))
    assert np.isfinite(float(ts3.reward))
