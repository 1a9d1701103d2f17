"""Composer-lite tests: entity composition, observables, lifecycle."""

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mbrl_tpu import composer
from mujoco_mbrl_tpu.physics import builder


class Arena(composer.Entity):
    def _build(self):
        root = builder.RootElement(model='arena')
        root.option(timestep=0.002)
        root.worldbody.add('geom', name='floor', type='plane',
                           size=[5, 5, 0.1])
        return root


class Pendulum(composer.Entity):
    """A torque-actuated pendulum prop with a tip observable."""

    def _build(self, gear=1.0):
        root = builder.RootElement(model='pendulum')
        body = root.worldbody.add('body', name='pole', pos=[0, 0, 1])
        body.add('joint', name='hinge', type='hinge', axis=[0, 1, 0],
                 damping=0.1)
        body.add('geom', name='mass', type='sphere', size=[0.05],
                 mass=1, pos=[0.4, 0, 0])
        root.actuator.add('motor', name='torque', joint='hinge', gear=gear)
        return root

    @composer.observable
    def angle(self, model, phys, data):
        j = model.names['joint'][self.name('hinge')]
        return phys.qpos[model.jnt_qposadr[j]]

    @composer.observable
    def tip_height(self, model, phys, data):
        b = model.names['body'][self.name('pole')]
        return data.xpos[b, 2]


class SwingUp(composer.Task):
    control_timestep = 0.02

    def __init__(self):
        super().__init__(Arena())
        self.pendulum = self.attach(Pendulum(), 'pend/')

    def get_reward(self, model, phys, data, ctrl):
        j = model.names['joint']['pend/hinge']
        return jnp.cos(phys.qpos[model.jnt_qposadr[j]])


def test_compose_and_run():
    env = composer.make_env(SwingUp(), time_limit=1.0)
    m = env.model
    assert 'pend/hinge' in m.names['joint']
    assert 'pend/torque' in m.names['actuator']
    state, ts = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert set(ts.observation) == {'pend/angle', 'pend/tip_height'}
    assert float(ts.observation['pend/tip_height']) == 1.0

    def roll(s):
        def body(st, _):
            st, ts = env.step(st, jnp.ones(m.nu))
            return st, ts.reward
        return jax.lax.scan(body, s, None, length=30)

    out, rews = jax.jit(roll)(state)
    assert np.isfinite(np.asarray(rews)).all()
    # torque must swing the pendulum away from rest
    assert abs(float(out.physics.qpos[0])) > 1e-3


def test_two_instances_independent():
    class Pair(composer.Task):
        def __init__(self):
            super().__init__(Arena())
            self.a = self.attach(Pendulum(), 'a/')
            self.b = self.attach(Pendulum(gear=3.0), 'b/')

        def get_reward(self, model, phys, data, ctrl):
            return jnp.zeros(())

    env = composer.make_env(Pair())
    m = env.model
    assert m.nu == 2 and m.nq == 2
    state, ts = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert {'a/angle', 'a/tip_height', 'b/angle',
            'b/tip_height'} <= set(ts.observation)
    # asymmetric gears: driving both with 1.0 moves b further
    def roll(s):
        def body(st, _):
            st, _ts = env.step(st, jnp.ones(2))
            return st, None
        return jax.lax.scan(body, s, None, length=25)[0]
    out = jax.jit(roll)(state)
    qa, qb = np.asarray(out.physics.qpos)
    assert abs(qb) > abs(qa)
