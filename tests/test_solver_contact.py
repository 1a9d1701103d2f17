"""Analytic ground-truth tests for the contact solvers (PGS and APGD).

The reference trusts libmujoco's solver blindly; here each solver variant
must reproduce closed-form rigid-body results:

* a sphere thrown with pure sliding velocity must transition to rolling at
  exactly v = 5/7 v0 (moment of inertia 2/5 m r^2 -> classic result),
* a block under tangential force below mu*m*g must NOT slide (static
  friction), and above it must accelerate at (F - mu*m*g)/m,
* both solvers must agree on a resting contact's normal force (= m*g).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mujoco_mbrl_tpu import physics
from mujoco_mbrl_tpu.physics import engine

_BALL_XML = """
<mujoco model='ball'>
  <option timestep='0.002' gravity='0 0 -9.81'/>
  <worldbody>
    <geom name='floor' type='plane' size='10 10 .1' friction='0.5'/>
    <body name='ball' pos='0 0 0.1'>
      <joint name='root' type='free'/>
      <geom name='ball' type='sphere' size='0.1' mass='1'
            friction='0.5'/>
    </body>
  </worldbody>
</mujoco>
"""

_BOX_XML = """
<mujoco model='box'>
  <option timestep='0.002' gravity='0 0 -9.81'/>
  <worldbody>
    <geom name='floor' type='plane' size='10 10 .1' friction='0.5'/>
    <body name='box' pos='0 0 0.1'>
      <joint name='root' type='free'/>
      <geom name='box' type='box' size='0.1 0.1 0.1' mass='1'
            friction='0.5'/>
    </body>
  </worldbody>
</mujoco>
"""

SOLVERS = ['pgs', 'apgd']


def _model(xml, solver):
    m = physics.parse(xml)
    return m.replace(opt=m.opt.replace(solver=solver))


def _simulate(m, state, ctrl, n):
    def body(s, _):
        return engine.step(m, s, ctrl), None
    out, _ = jax.jit(
        lambda s: jax.lax.scan(body, s, None, length=n))(state)
    return out


@pytest.mark.parametrize('solver', SOLVERS)
def test_sliding_sphere_transitions_to_rolling(solver):
    m = _model(_BALL_XML, solver)
    v0 = 2.0
    qvel = jnp.zeros(m.nv).at[0].set(v0)
    state = physics.make_state(m, qvel=qvel)
    # friction decel = mu*g ~ 4.9 m/s^2; slip gone after ~0.12 s
    out = _simulate(m, state, jnp.zeros(m.nu), 300)
    v = float(out.qvel[0])
    w = float(out.qvel[4])          # spin about +y
    r = 0.1
    assert v == pytest.approx(5.0 / 7.0 * v0, rel=0.02), \
        f'{solver}: rolling speed should be 5/7 v0'
    assert v == pytest.approx(w * r, rel=0.02), \
        f'{solver}: rolling without slipping (v = w r)'


@pytest.mark.parametrize('solver', SOLVERS)
def test_static_friction_holds_block(solver):
    m = _model(_BOX_XML, solver)
    state = physics.make_state(m)
    # settle first
    state = _simulate(m, state, jnp.zeros(m.nu), 200)
    state = physics.make_state(m, qpos=state.qpos)
    # push with F = 2 N < mu*m*g = 4.9 N via xfrc-equivalent: tilt gravity
    # (no applied-force API on purpose; equivalent physics)
    g = 9.81
    fx = 2.0
    m2 = m.replace(opt=m.opt.replace(
        gravity=jnp.array([fx, 0.0, -g], jnp.float32)))
    out = _simulate(m2, state, jnp.zeros(m.nu), 250)
    assert abs(float(out.qvel[0])) < 0.05, \
        f'{solver}: below-threshold force must not slide the block'


@pytest.mark.parametrize('solver', SOLVERS)
def test_kinetic_friction_acceleration(solver):
    m = _model(_BOX_XML, solver)
    state = physics.make_state(m)
    state = _simulate(m, state, jnp.zeros(m.nu), 200)
    state = physics.make_state(m, qpos=state.qpos)
    g = 9.81
    fx = 8.0                      # > mu*m*g = 4.905
    m2 = m.replace(opt=m.opt.replace(
        gravity=jnp.array([fx, 0.0, -g], jnp.float32)))
    n = 250
    out = _simulate(m2, state, jnp.zeros(m.nu), n)
    t = n * float(m.opt.timestep)
    expected_v = (fx - 0.5 * g) * t
    assert float(out.qvel[0]) == pytest.approx(expected_v, rel=0.05), \
        f'{solver}: sliding accel should be F - mu*m*g'


def test_solvers_agree_on_resting_normal_force():
    forces = {}
    for solver in SOLVERS:
        m = _model(_BALL_XML, solver)
        state = physics.make_state(m)
        state = _simulate(m, state, jnp.zeros(m.nu), 500)
        d = jax.jit(lambda s: engine.forward(m, s, jnp.zeros(m.nu)))(state)
        forces[solver] = float(np.asarray(d.contact_force)[:, 0].sum())
    assert forces['pgs'] == pytest.approx(9.81, rel=0.02)
    assert forces['apgd'] == pytest.approx(forces['pgs'], rel=0.02)


@pytest.mark.parametrize('solver', SOLVERS)
def test_walker_batch_stays_finite(solver):
    """Randomized walker resets must not NaN over 300 substeps (catches
    the bf16-matmul mass-matrix indefiniteness regression)."""
    from mujoco_mbrl_tpu import suite
    env = suite.load('walker', 'walk')
    m = env.model.replace(opt=env.model.opt.replace(solver=solver))
    B = 16
    state0, _ = jax.vmap(env.reset)(
        jax.random.split(jax.random.PRNGKey(0), B))

    def roll(s):
        def body(st, _):
            st = jax.vmap(
                lambda ss: engine.substep(m, ss, jnp.zeros(m.nu), 10))(st)
            return st, None
        out, _ = jax.lax.scan(body, s, None, length=30)
        return out

    out = jax.jit(roll)(state0.physics)
    assert np.isfinite(np.asarray(out.qpos)).all()
    assert np.isfinite(np.asarray(out.qvel)).all()
