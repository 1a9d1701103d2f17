"""Prop entity library tests (entities/props analogue).

Mirrors the reference's primitive_test.py / position_detector_test.py
behavioral contracts: primitives expose pose/velocity observables and
fall under gravity; detectors flag registered entities inside (or, when
inverted, outside) their zone.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mbrl_tpu import composer, props, suite
from mujoco_mbrl_tpu.locomotion import arenas
from mujoco_mbrl_tpu.physics import engine


class _PropTask(composer.Task):
    def __init__(self, inverted=False, drop_pos=(0.0, 0.0, 0.5)):
        super().__init__(arenas.Floor(size=(4.0, 4.0)))
        self.prop = self.attach(props.Primitive(
            geom_type='sphere', size=[0.1], pos=drop_pos), 'prop/')
        self.detector = self.attach(props.PositionDetector(
            pos=[1.0, 0.0, 0.15], size=[0.3, 0.3, 0.15],
            inverted=inverted), 'det/')
        self.detector.register_entities(self.prop)

    def get_reward(self, model, phys, data, ctrl):
        return jnp.zeros(())


def _build(inverted=False, drop_pos=(0.0, 0.0, 0.5)):
    env = suite  # noqa: F841  (keep import used)
    task = _PropTask(inverted=inverted, drop_pos=drop_pos)
    return task, composer.make_env(task, control_timestep=0.02)


def test_primitive_falls_and_observables():
    task, env = _build()
    st, ts = env.reset(jax.random.PRNGKey(0))
    obs = ts.observation
    assert obs['prop/position'].shape == (3,)
    assert obs['prop/orientation'].shape == (4,)
    assert obs['prop/linear_velocity'].shape == (3,)
    assert obs['prop/angular_velocity'].shape == (3,)
    z0 = float(obs['prop/position'][2])

    def body(carry, _):
        st = carry
        st, ts = env.step(st, jnp.zeros((0,)))
        return st, ts.observation['prop/position'][2]

    st, zs = jax.jit(lambda s: jax.lax.scan(body, s, None, length=60))(st)
    zs = np.asarray(zs)
    assert zs[-1] < z0 - 0.2                     # it fell
    np.testing.assert_allclose(zs[-1], 0.1, atol=0.03)  # rests at radius


def test_detector_flags_inside_and_outside():
    task, env = _build()
    st, ts = env.reset(jax.random.PRNGKey(0))
    m = env._model_with(st.params)
    # outside at reset (prop over origin, detector at x=1)
    assert ts.observation['det/detected'].shape == (1,)
    assert float(ts.observation['det/detected'][0]) == 0.0
    # teleport the prop into the zone
    qpos = task.prop.set_pose(m, st.physics.qpos, pos=[1.0, 0.0, 0.1])
    phys = st.physics.replace(qpos=qpos)
    data = engine.forward(m, phys, jnp.zeros((m.nu,), qpos.dtype))
    det = task.detector.detections(m, data)
    assert bool(det[0])
    assert bool(task.detector.activated(m, data))


def test_detector_inverted():
    task, env = _build(inverted=True)
    st, ts = env.reset(jax.random.PRNGKey(0))
    # prop starts OUTSIDE the zone -> inverted detector reports True
    assert float(ts.observation['det/detected'][0]) == 1.0


def test_detection_is_jittable():
    task, env = _build()
    st, _ = env.reset(jax.random.PRNGKey(0))
    m = env._model_with(st.params)

    @jax.jit
    def probe(phys):
        data = engine.forward(m, phys, jnp.zeros((m.nu,), phys.qpos.dtype))
        return task.detector.detections(m, data)

    out = probe(st.physics)
    assert out.shape == (1,) and out.dtype == bool


def test_primitive_validates_size():
    try:
        props.Primitive(geom_type='box', size=[0.1])
    except ValueError as e:
        assert 'size' in str(e)
    else:
        raise AssertionError('expected ValueError')
