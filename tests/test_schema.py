"""MJCF schema validation + typed attributes + bindings (physics/schema).

Parity intent: dm_control's PyMJCF rejects unknown elements/attributes
and ill-typed values at construction time (mjcf/element.py raising via
the generated schema, mjcf/schema.py), exposes typed attribute values,
and binds DOM elements to compiled-model addresses
(mjcf/physics.py:276-410 ``physics.bind``). The corpus case pushes every
registered suite domain's XML through the strict parser, so the schema
provably covers the model subset this framework ships.
"""

import numpy as np
import pytest

import jax

from mujoco_mbrl_tpu.physics import schema
from mujoco_mbrl_tpu.physics.builder import RootElement, SchemaError


def test_unknown_tag_rejected():
    root = RootElement(model='t')
    with pytest.raises(SchemaError, match='unknown MJCF element'):
        root.worldbody.add('bodyy', name='oops')


def test_misplaced_child_rejected():
    root = RootElement(model='t')
    with pytest.raises(SchemaError, match='not a valid child'):
        root.worldbody.add('motor', name='m')   # actuator section only


def test_unknown_attribute_rejected():
    root = RootElement(model='t')
    with pytest.raises(SchemaError, match='unknown attribute'):
        root.worldbody.add('body', name='b', poss=[0, 0, 1])


def test_ill_typed_value_rejected():
    root = RootElement(model='t')
    b = root.worldbody.add('body', name='b')
    with pytest.raises(SchemaError, match='invalid'):
        b.add('joint', name='j', type='hingee')      # bad keyword
    with pytest.raises(SchemaError, match='invalid'):
        b.add('geom', type='sphere', size=[0.1], pos=[1.0, 2.0])  # 2 != 3


def test_typed_attribute_read():
    root = RootElement(model='t')
    b = root.worldbody.add('body', name='b', pos=[0, 0, 1.5])
    g = b.add('geom', type='sphere', size=[0.05], mass=2)
    np.testing.assert_allclose(b.get('pos'), [0, 0, 1.5])
    assert isinstance(g.get('mass'), float) and g.get('mass') == 2.0
    assert g.get('type') == 'sphere'
    assert b.get('quat') is None              # absent -> default


def test_context_dependent_tags():
    # <joint> under <tendon><fixed> has {joint, coef}, not the joint set
    root = RootElement(model='t')
    b = root.worldbody.add('body', name='b')
    b.add('joint', name='j1', type='hinge', axis=[0, 1, 0])
    fx = root.tendon.add('fixed', name='t')
    fx.add('joint', joint='j1', coef=1.0)     # valid in context
    with pytest.raises(SchemaError):
        fx.add('joint', name='j2', type='hinge')  # joint-def attrs invalid


def test_strict_false_accepts_unknown():
    root = RootElement.from_xml_string(
        "<mujoco model='x'><worldbody><body name='b' "
        "custom_attr='1'/></worldbody></mujoco>", strict=False)
    assert root.worldbody.find('body', 'b') is not None
    assert root.schema_warnings == []          # strict=False: no checks


def test_document_mode_warns_not_raises():
    """Parsing a document with out-of-subset-but-valid-MuJoCo content
    must succeed and surface warnings (full MuJoCo accepts e.g.
    <visual><global/> and sensor tags; advisor r4 finding)."""
    root = RootElement.from_xml_string(
        "<mujoco model='x'><visual><global offwidth='640'/>"
        "<headlight diffuse='.6 .6 .6'/></visual>"
        "<sensor><jointpos joint='j'/></sensor>"
        "<worldbody><body name='b' custom_attr='1'/>"
        "</worldbody></mujoco>", strict=True)
    assert root.worldbody.find('body', 'b') is not None
    assert any('custom_attr' in w for w in root.schema_warnings)
    assert len(root.schema_warnings) >= 2
    # ill-typed values of KNOWN attributes still raise in document mode
    with pytest.raises(SchemaError, match='invalid'):
        RootElement.from_xml_string(
            "<mujoco model='x'><worldbody><body name='b' "
            "pos='not a number'/></worldbody></mujoco>", strict=True)
    # programmatic construction stays fully strict
    with pytest.raises(SchemaError, match='unknown attribute'):
        RootElement(model='t').worldbody.add('body', custom_attr='1')


def _domain_xmls():
    """Every XML string a registered suite domain compiles."""
    import mujoco_mbrl_tpu.suite as suite_pkg
    xmls = {}
    for mod_name in ('acrobot', 'ball_in_cup', 'cartpole', 'cheetah',
                     'finger', 'fish', 'hopper', 'humanoid',
                     'humanoid_cmu', 'lqr', 'manipulator', 'pendulum',
                     'point_mass', 'reacher', 'stacker', 'swimmer',
                     'walker'):
        mod = getattr(__import__(f'mujoco_mbrl_tpu.suite.{mod_name}',
                                 fromlist=[mod_name]), '__name__', None)
        import importlib
        m = importlib.import_module(f'mujoco_mbrl_tpu.suite.{mod_name}')
        for attr in dir(m):
            if attr.endswith('_XML') or attr == '_XML':
                xmls[f'{mod_name}.{attr}'] = getattr(m, attr)
    # domains whose XML is built by a generator function, not a module
    # constant (advisor r4: these were missing from the corpus)
    from mujoco_mbrl_tpu.suite import quadruped, swimmer
    xmls['quadruped._make_xml'] = quadruped._make_xml(10.0)
    xmls['quadruped._make_xml_walls'] = quadruped._make_xml(
        10.0, walls_and_ball=True)
    xmls['swimmer._make_model_xml_6'] = swimmer._make_model_xml(6)
    xmls['swimmer._make_model_xml_15'] = swimmer._make_model_xml(15)
    return xmls


def test_schema_covers_suite_corpus():
    """Strict parsing must accept every shipped domain model — with no
    warnings either: the curated schema fully covers our own corpus."""
    xmls = _domain_xmls()
    assert len(xmls) >= 15
    for name, xml in xmls.items():
        try:
            root = RootElement.from_xml_string(xml, strict=True)
        except SchemaError as e:
            raise AssertionError(f'{name}: {e}') from e
        assert not root.schema_warnings, (
            f'{name}: schema gaps {root.schema_warnings[:5]}')
        # round-trip still compiles through the AOT compiler
        assert root.to_xml_string().startswith('<mujoco')


def test_bind_joint_geom_actuator():
    root = RootElement(model='t')
    root.option(timestep=0.002)
    b = root.worldbody.add('body', name='pole', pos=[0, 0, 1])
    j = b.add('joint', name='hinge', type='hinge', axis=[0, 1, 0])
    g = b.add('geom', name='tip', type='sphere', size=[0.05], mass=1)
    root.actuator.add('motor', name='torque', joint='hinge', gear=[1])
    model = root.compile()

    jb = schema.bind(model, j)
    assert jb.element_id == model.name2id('joint', 'hinge')
    from mujoco_mbrl_tpu.physics import engine, make_state
    import jax.numpy as jnp
    state = make_state(model)
    assert jb.qpos(state).shape == (1,)
    assert jb.qvel(state).shape == (1,)

    data = engine.forward(model, state, jnp.zeros((model.nu,)))
    gb = schema.bind(model, g)
    assert gb.xpos(data).shape == (3,)
    bb = schema.bind(model, 'body', 'pole')
    np.testing.assert_allclose(np.asarray(bb.xpos(data)), [0, 0, 1],
                               atol=1e-6)
    ab = schema.bind(model, root.actuator.find('motor', 'torque'))
    assert ab.kind == 'actuator' and ab.element_id == 0

    with pytest.raises(SchemaError):
        schema.bind(model, root.worldbody)        # unbindable tag
