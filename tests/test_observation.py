"""Observation pipeline semantics (composer/observation/updater.py:90,
obs_buffer.py:53 contract at control-step granularity) + variation ops."""

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mbrl_tpu import composer, variation
from mujoco_mbrl_tpu.observation import (BufferedEnvironment,
                                         ObservableSpec, init_buffer,
                                         read_buffer, update_buffer)


def _drive(spec, values, key=None):
    """Feed a scripted value sequence; return the read after each step."""
    st = init_buffer(spec, jnp.asarray(values[0]))
    out = []
    k = key if key is not None else jax.random.PRNGKey(0)
    for v in values:
        k, sub = jax.random.split(k)
        st = update_buffer(spec, st, jnp.asarray(v), sub)
        out.append(float(np.asarray(read_buffer(spec, st))))
    return out


class TestBufferSemantics:
    def test_passthrough_default(self):
        spec = ObservableSpec()
        assert _drive(spec, [1., 2., 3., 4.]) == [1., 2., 3., 4.]

    def test_delay_shifts_visibility(self):
        # a sample taken at step t matures at t+delay; before the first
        # maturation the primed initial value (0) is visible
        spec = ObservableSpec(delay=2)
        out = _drive(spec, [0., 1., 2., 3., 4., 5.])
        assert out == [0., 0., 0., 1., 2., 3.]

    def test_update_interval_holds_value(self):
        spec = ObservableSpec(update_interval=3)
        out = _drive(spec, [10., 11., 12., 13., 14., 15., 16.])
        assert out == [10., 10., 10., 13., 13., 13., 16.]

    def test_buffer_aggregator_mean(self):
        spec = ObservableSpec(buffer_size=3, aggregator='mean')
        out = _drive(spec, [3., 6., 9., 12.])
        # ring primed with 3s: [3,3,3] -> replace oldest each step
        assert out == [3.0, 4.0, 6.0, 9.0]

    def test_buffer_without_aggregator_returns_stack(self):
        spec = ObservableSpec(buffer_size=2)
        st = init_buffer(spec, jnp.asarray(1.0))
        st = update_buffer(spec, st, jnp.asarray(2.0),
                           jax.random.PRNGKey(0))
        val = read_buffer(spec, st)
        assert val.shape == (2,)
        np.testing.assert_allclose(np.asarray(val), [1.0, 2.0])

    def test_corruptor_deterministic_in_key(self):
        noise = variation.Additive(variation.Normal(0.0, 0.1))
        spec = ObservableSpec(corruptor=noise)
        key = jax.random.PRNGKey(7)
        a = _drive(spec, [1., 1., 1.], key=key)
        b = _drive(spec, [1., 1., 1.], key=key)
        assert a == b
        assert any(abs(x - 1.0) > 1e-4 for x in a), 'noise not applied'


class TestVariation:
    def test_distributions_shapes_and_ranges(self):
        key = jax.random.PRNGKey(0)
        u = variation.Uniform(2.0, 3.0)(key, (100,))
        assert float(u.min()) >= 2.0 and float(u.max()) <= 3.0
        n = variation.Normal(5.0, 0.1)(key, (200,))
        assert abs(float(n.mean()) - 5.0) < 0.1
        c = variation.UniformChoice([1., 4., 9.])(key, (50,))
        assert set(np.unique(np.asarray(c))) <= {1., 4., 9.}
        s = variation.UniformPointOnSphere()(key, (10,))
        np.testing.assert_allclose(np.linalg.norm(np.asarray(s), axis=-1),
                                   1.0, rtol=1e-5)

    def test_evaluate_resolves_nested(self):
        tree = {'a': variation.Uniform(0, 1), 'b': 3.0,
                'c': [variation.Normal(), 2.0]}
        out = variation.evaluate(tree, jax.random.PRNGKey(0))
        assert isinstance(out['a'], jnp.ndarray)
        assert out['b'] == 3.0 and out['c'][1] == 2.0


# ---- integration with a composed env (mirrors tests/test_composer.py) ---

class Arena(composer.Entity):
    def _build(self):
        from mujoco_mbrl_tpu.physics import builder
        root = builder.RootElement(model='arena')
        root.option(timestep=0.01)
        return root


class Pendulum(composer.Entity):
    def _build(self, gear=1.0):
        from mujoco_mbrl_tpu.physics import builder
        root = builder.RootElement(model='pendulum')
        body = root.worldbody.add('body', name='pole', pos=[0, 0, 1])
        body.add('joint', name='hinge', type='hinge', axis=[0, 1, 0],
                 damping=0.05)
        body.add('geom', name='mass', type='sphere', size=[0.05],
                 mass=1, pos=[0.4, 0, 0])
        root.actuator.add('motor', name='torque', joint='hinge', gear=gear)
        return root

    @composer.observable
    def angle(self, model, phys, data):
        j = model.names['joint'][self.name('hinge')]
        return phys.qpos[model.jnt_qposadr[j]]

    @composer.observable
    def velocity(self, model, phys, data):
        j = model.names['joint'][self.name('hinge')]
        return phys.qvel[model.jnt_dofadr[j]]

    @composer.observable(buffer_size=4, aggregator='mean', delay=1)
    def smoothed_velocity(self, model, phys, data):
        j = model.names['joint'][self.name('hinge')]
        return phys.qvel[model.jnt_dofadr[j]]


class SwingUp(composer.Task):
    control_timestep = 0.02

    def __init__(self):
        super().__init__(Arena())
        self.pendulum = self.attach(Pendulum(), 'pend/')

    def get_reward(self, model, phys, data, ctrl):
        j = model.names['joint']['pend/hinge']
        return jnp.cos(phys.qpos[model.jnt_qposadr[j]])


def test_buffered_env_end_to_end():
    env = composer.make_env(SwingUp(), time_limit=1.0)
    assert isinstance(env, BufferedEnvironment)
    state, ts = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert 'pend/smoothed_velocity' in ts.observation

    def body(carry, _):
        st = carry
        st, ts = env.step(st, jnp.ones((1,)) * 0.5)
        return st, (ts.observation['pend/smoothed_velocity'],
                    ts.observation['pend/velocity'])

    st, (sm, vel) = jax.jit(
        lambda s: jax.lax.scan(body, s, None, length=20))(state)
    sm, vel = np.asarray(sm), np.asarray(vel)
    assert np.isfinite(sm).all() and np.isfinite(vel).all()
    # after warm-up, the buffered value at step t is the mean of the raw
    # samples from steps t-4..t-1 (buffer 4, delay 1); velocity at reset
    # is 0, so prepend it for the early window
    raw = np.concatenate([[0.0], vel])
    for t in range(6, 20):
        want = raw[t - 3:t + 1].mean()   # samples t-4..t-1 of obs stream
        np.testing.assert_allclose(sm[t], want, rtol=1e-5, atol=1e-6)

    # deterministic under the same key
    st2, (sm2, _) = jax.jit(
        lambda s: jax.lax.scan(body, s, None, length=20))(state)
    np.testing.assert_array_equal(sm, sm2)
