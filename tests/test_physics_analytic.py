"""Analytic ground-truth tests for the physics core.

Strategy mirrors the reference's use of exact-math oracles
(reference ``dm_control/dm_control/suite/tests/lqr_test.py:43-54``): instead
of comparing against another simulator, we compare against closed-form
Lagrangian dynamics of simple systems.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mujoco_mbrl_tpu import physics
from mujoco_mbrl_tpu.physics import model as M

PENDULUM_XML = """
<mujoco model='pend'>
  <option timestep='0.001'><flag contact='disable'/></option>
  <worldbody>
    <body name='pole' pos='0 0 .6'>
      <joint name='hinge' type='hinge' axis='0 1 0'/>
      <geom name='mass' type='sphere' pos='0 0 0.5' size='0.05' mass='1'/>
    </body>
  </worldbody>
</mujoco>
"""

CARTPOLE_XML = """
<mujoco model='cartpole'>
  <option timestep='0.01' integrator='RK4'><flag contact='disable'/></option>
  <worldbody>
    <body name='cart' pos='0 0 1'>
      <joint name='slider' type='slide' limited='true' axis='1 0 0'
             range='-1.8 1.8' damping='5e-4'/>
      <geom name='cart' type='box' size='0.2 0.15 0.1' mass='1'/>
      <body name='pole_1'>
        <joint name='hinge_1' type='hinge' axis='0 1 0' damping='2e-6'/>
        <geom name='pole_1' type='capsule' fromto='0 0 0 0 0 1'
              size='0.045' mass='.1'/>
      </body>
    </body>
  </worldbody>
  <actuator>
    <motor name='slide' joint='slider' gear='10' ctrllimited='true'
           ctrlrange='-1 1'/>
  </actuator>
</mujoco>
"""


def _capsule_inertia_perp(r, h, mass):
    """Perpendicular-axis inertia of a capsule about its CoM."""
    height = 2 * h
    ms = mass * 4 * r / (4 * r + 3 * height)
    mc = mass - ms
    i = mc * (3 * r * r + height * height) / 12.0
    i += 0.4 * ms * r * r + ms * height * (3 * r + 2 * height) / 8.0
    return i


class TestPendulum:
    def test_energy_conservation(self):
        m = physics.parse(PENDULUM_XML)
        s = physics.make_state(m, qpos=jnp.array([0.5]))

        def body(st, _):
            return physics.step(m, st, jnp.zeros((0,))), st

        _, traj = jax.jit(lambda s: jax.lax.scan(body, s, None, 2000))(s)
        ths = np.asarray(traj.qpos[:, 0])
        ws = np.asarray(traj.qvel[:, 0])
        l, g, mm, r = 0.5, 9.81, 1.0, 0.05
        inertia = mm * l * l + 0.4 * mm * r * r
        E = 0.5 * inertia * ws ** 2 + mm * g * l * np.cos(ths)
        assert E.max() - E.min() < 0.05 * abs(E[0])

    def test_matches_analytic_trajectory(self):
        m = physics.parse(PENDULUM_XML)
        s = physics.make_state(m, qpos=jnp.array([0.5]))

        def body(st, _):
            return physics.step(m, st, jnp.zeros((0,))), st

        _, traj = jax.jit(lambda s: jax.lax.scan(body, s, None, 1000))(s)
        ths = np.asarray(traj.qpos[:, 0])

        # fine-step symplectic integration of the analytic ODE
        l, g, mm, r = 0.5, 9.81, 1.0, 0.05
        inertia = mm * l * l + 0.4 * mm * r * r
        th, w, dt = 0.5, 0.0, 1e-5
        ref = []
        for i in range(int(1.0 / dt)):
            if i % 100 == 0:
                ref.append(th)
            w += dt * (mm * g * l / inertia) * np.sin(th)
            th += dt * w
        assert np.abs(ths - np.array(ref[:1000])).max() < 5e-3


class TestCartpole:
    def _analytic_qacc(self, x, th, xd, thd, force):
        """Lagrangian cartpole dynamics (pole pointing up at th=0)."""
        Mc, mp, l, g = 1.0, 0.1, 0.5, 9.81
        Ic = _capsule_inertia_perp(0.045, 0.5, mp)
        bx, bth = 5e-4, 2e-6
        A = np.array([
            [Mc + mp, mp * l * np.cos(th)],
            [mp * l * np.cos(th), Ic + mp * l * l],
        ])
        rhs = np.array([
            force + mp * l * np.sin(th) * thd ** 2 - bx * xd,
            mp * g * l * np.sin(th) - bth * thd,
        ])
        return np.linalg.solve(A, rhs)

    @pytest.mark.parametrize('state,ctrl', [
        ((0.0, 0.1, 0.0, 0.0), 0.0),
        ((0.3, 2.0, -0.5, 1.5), 0.7),
        ((-0.5, np.pi, 1.0, -2.0), -1.0),
    ])
    def test_forward_matches_lagrangian(self, state, ctrl):
        m = physics.parse(CARTPOLE_XML)
        x, th, xd, thd = state
        s = physics.make_state(m, qpos=jnp.array([x, th]),
                               qvel=jnp.array([xd, thd]))
        d = physics.forward(m, s, jnp.array([ctrl]))
        expected = self._analytic_qacc(x, th, xd, thd, 10.0 * ctrl)
        np.testing.assert_allclose(np.asarray(d.qacc), expected,
                                   rtol=1e-4, atol=1e-4)

    def test_slider_limit_pushback(self):
        """Soft limit generates a restoring constraint force."""
        m = physics.parse(CARTPOLE_XML)
        s = physics.make_state(m, qpos=jnp.array([1.85, 0.0]),
                               qvel=jnp.array([0.5, 0.0]))
        d = physics.forward(m, s, jnp.zeros(1))
        # constraint must push the cart back toward the rail (negative x)
        assert float(d.qfrc_constraint[0]) < 0.0

    def test_rk4_stepping_consistent(self):
        """RK4 at dt=0.01 should track fine-step Euler closely."""
        m = physics.parse(CARTPOLE_XML)
        s = physics.make_state(m, qpos=jnp.array([0.0, 0.3]))

        def body(st, _):
            return physics.step(m, st, jnp.array([0.2])), st

        final, _ = jax.jit(lambda s: jax.lax.scan(body, s, None, 100))(s)

        # analytic RK4 at much finer step
        y = np.array([0.0, 0.3, 0.0, 0.0])

        def f(y):
            qacc = self._analytic_qacc(y[0], y[1], y[2], y[3], 2.0)
            return np.array([y[2], y[3], qacc[0], qacc[1]])

        dt = 1e-4
        for _ in range(10000):
            k1 = f(y)
            k2 = f(y + dt / 2 * k1)
            k3 = f(y + dt / 2 * k2)
            k4 = f(y + dt * k3)
            y = y + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)

        np.testing.assert_allclose(
            np.asarray(jnp.concatenate([final.qpos, final.qvel])), y,
            rtol=2e-3, atol=2e-3)


class TestMJCFCompiler:
    def test_capsule_fromto(self):
        m = physics.parse(CARTPOLE_XML)
        g = m.names['geom']['pole_1']
        np.testing.assert_allclose(np.asarray(m.geom_pos[g]),
                                   [0, 0, 0.5], atol=1e-6)
        np.testing.assert_allclose(float(m.geom_size[g, 1]), 0.5, atol=1e-6)

    def test_body_mass_and_com(self):
        m = physics.parse(CARTPOLE_XML)
        cart = m.names['body']['cart']
        pole = m.names['body']['pole_1']
        assert abs(float(m.body_mass[cart]) - 1.0) < 1e-6
        assert abs(float(m.body_mass[pole]) - 0.1) < 1e-6
        np.testing.assert_allclose(np.asarray(m.body_ipos[pole]),
                                   [0, 0, 0.5], atol=1e-6)

    def test_defaults_and_classes(self):
        xml = """
        <mujoco>
          <default>
            <joint damping='3'/>
            <default class='special'><joint damping='7'/></default>
          </default>
          <worldbody>
            <body name='a' pos='0 0 1'>
              <joint name='j1' type='hinge'/>
              <geom type='sphere' size='.1' mass='1'/>
              <body name='b' childclass='special'>
                <joint name='j2' type='hinge'/>
                <geom type='sphere' size='.1' mass='1'/>
              </body>
            </body>
          </worldbody>
        </mujoco>
        """
        m = physics.parse(xml)
        assert float(m.dof_damping[0]) == 3.0
        assert float(m.dof_damping[1]) == 7.0

    def test_degrees_default(self):
        xml = """
        <mujoco>
          <worldbody>
            <body name='a' pos='0 0 1'>
              <joint name='j' type='hinge' limited='true' range='-90 90'/>
              <geom type='sphere' size='.1' mass='1'/>
            </body>
          </worldbody>
        </mujoco>
        """
        m = physics.parse(xml)
        np.testing.assert_allclose(np.asarray(m.jnt_range[0]),
                                   [-np.pi / 2, np.pi / 2], rtol=1e-5)
