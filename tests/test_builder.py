"""PyMJCF-lite programmatic model builder tests (physics/builder.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mbrl_tpu.physics import builder, engine, make_state


def _pendulum(name='pendulum', gear=1.0):
    root = builder.RootElement(model=name)
    root.option(timestep=0.002)
    body = root.worldbody.add('body', name='pole', pos=[0, 0, 1])
    body.add('joint', name='hinge', type='hinge', axis=[0, 1, 0],
             damping=0.05)
    body.add('geom', name='mass', type='sphere', size=[0.05], mass=1,
             pos=[0.5, 0, 0])
    root.actuator.add('motor', name='torque', joint='hinge', gear=gear)
    return root


def test_build_compile_simulate():
    m = _pendulum().compile()
    assert m.nq == 1 and m.nu == 1
    s = make_state(m)

    def roll(s):
        def body(st, _):
            return engine.step(m, st, jnp.ones(1)), st.qpos[0]
        return jax.lax.scan(body, s, None, length=200)

    _, q = jax.jit(roll)(s)
    q = np.asarray(q)
    assert np.isfinite(q).all()
    assert abs(q[-1]) > 1e-3, 'torque should swing the pendulum'


def test_find_and_set():
    root = _pendulum()
    geom = root.find('geom', 'mass')
    assert geom is not None
    geom.set(mass=2.0)
    m1 = _pendulum().compile()
    m2 = root.compile()
    assert float(m2.body_mass[1]) == 2 * float(m1.body_mass[1])


def test_attach_scopes_names():
    """Two copies of a sub-model attach under distinct prefixes; all
    joints/geoms/actuators exist under scoped names and the composite
    compiles and steps (the PyMJCF composition workflow,
    mjcf/namescope.py:28)."""
    root = builder.RootElement(model='pair')
    root.option(timestep=0.002)
    frame_a = root.worldbody.add('body', name='mount_a', pos=[0, 0, 1])
    frame_b = root.worldbody.add('body', name='mount_b', pos=[1, 0, 1])
    frame_a.attach(_pendulum(), 'a/')
    frame_b.attach(_pendulum(gear=2.0), 'b/')
    m = root.compile()
    assert m.nq == 2 and m.nu == 2
    for n in ('a/hinge', 'b/hinge'):
        assert n in m.names['joint']
    for n in ('a/torque', 'b/torque'):
        assert n in m.names['actuator']
    # gears preserved per instance
    ua, ub = m.names['actuator']['a/torque'], m.names['actuator']['b/torque']
    assert float(m.actuator_gear[ub]) == 2 * float(m.actuator_gear[ua])
    s = make_state(m)
    out = jax.jit(lambda st: engine.step(m, st, jnp.ones(2)))(s)
    assert np.isfinite(np.asarray(out.qpos)).all()


def test_xml_round_trip():
    xml = _pendulum().to_xml_string()
    assert "<mujoco model='pendulum'>" in xml
    from mujoco_mbrl_tpu.physics import mjcf
    m = mjcf.parse(xml)
    assert m.nq == 1


class TestFromXmlString:
    """RootElement.from_xml_string (mjcf.from_xml_string analogue):
    existing MJCF files become editable, attachable element trees."""

    def test_walker_roundtrip_compiles_identically(self):
        import numpy as np
        from mujoco_mbrl_tpu.physics import builder, mjcf
        from mujoco_mbrl_tpu.suite import walker as wmod
        m_direct = mjcf.parse(wmod._XML)
        m_rt = builder.RootElement.from_xml_string(wmod._XML).compile()
        assert (m_direct.njnt, m_direct.nv, m_direct.nu, m_direct.ngeom
                ) == (m_rt.njnt, m_rt.nv, m_rt.nu, m_rt.ngeom)
        np.testing.assert_allclose(np.asarray(m_direct.body_pos),
                                   np.asarray(m_rt.body_pos))
        np.testing.assert_allclose(np.asarray(m_direct.jnt_range),
                                   np.asarray(m_rt.jnt_range))
        np.testing.assert_allclose(np.asarray(m_direct.geom_size),
                                   np.asarray(m_rt.geom_size))

    def test_non_mujoco_root_rejected(self):
        import pytest
        from mujoco_mbrl_tpu.physics import builder
        with pytest.raises(ValueError):
            builder.RootElement.from_xml_string('<robot/>')
