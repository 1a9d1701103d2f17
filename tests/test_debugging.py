"""PyMJCF-style debug mode + export_with_assets.

Covers the reference's mjcf/debugging_test.py and
export_with_assets_test.py contracts: provenance recording traces a DOM
mutation back to the user source line; export writes a loadable XML
plus assets into a directory.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from mujoco_mbrl_tpu.physics import builder, debugging


@pytest.fixture
def debug_on():
    debugging.enable_debug_mode()
    yield
    debugging.disable_debug_mode()


def _build_pendulum():
    root = builder.RootElement(model='dbg_pendulum')
    root.option(timestep=0.002)
    body = root.worldbody.add('body', name='pole', pos=[0, 0, 1])
    body.add('joint', name='hinge', type='hinge', axis=[0, 1, 0])
    body.add('geom', name='mass', type='sphere', size=[0.05], mass=1)
    root.actuator.add('motor', name='torque', joint='hinge', gear=1)
    return root


def test_provenance_records_user_site(debug_on):
    root = _build_pendulum()
    geom = root.worldbody.find('geom', 'mass')
    ctx = debugging.debug_context(geom)
    # the creation site is THIS test file, not builder internals
    assert 'test_debugging.py' in ctx
    assert '<geom> created at' in ctx
    # attribute set records its own site
    geom.set(mass=2)
    ctx = debugging.debug_context(geom)
    assert "attribute 'mass' last set at" in ctx


def test_provenance_off_by_default():
    root = _build_pendulum()
    geom = root.worldbody.find('geom', 'mass')
    assert 'no debug info recorded' in debugging.debug_context(geom)


def test_dump_full_debug_info(tmp_path, debug_on):
    root = _build_pendulum()
    out = tmp_path / 'dump.xml'
    xml = debugging.dump_full_debug_info(root, str(out))
    assert '<!-- created at test_debugging.py:' in xml
    text = out.read_text()
    assert 'ELEMENT PROVENANCE' in text
    assert '<geom' in text


def test_export_with_assets(tmp_path):
    root = _build_pendulum()
    root.assets['readme.txt'] = 'asset payload'
    path = debugging.export_with_assets(root, str(tmp_path))
    assert path.endswith('dbg_pendulum.xml')
    assert (tmp_path / 'readme.txt').read_text() == 'asset payload'
    # the exported XML round-trips through the parser and compiles
    reparsed = builder.RootElement.from_xml_string(
        (tmp_path / 'dbg_pendulum.xml').read_text())
    m = reparsed.compile()
    assert m.nq == 1


def test_export_name_validation(tmp_path):
    root = _build_pendulum()
    with pytest.raises(ValueError):
        debugging.export_with_assets(root, str(tmp_path),
                                     out_file_name='model.txt')
