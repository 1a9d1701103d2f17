"""Box contact kernels (sphere-box, capsule-box, box-box): analytic
distances and resting stability — the geometry the stacker domain needs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mujoco_mbrl_tpu import physics
from mujoco_mbrl_tpu.physics import collision, engine
from mujoco_mbrl_tpu.physics import model as M


def _detect_pair(m, qpos, g1, g2):
    # The engine wraps its own calls in highest matmul precision
    # (engine.py); calling the narrowphase directly must do the same or
    # the TPU tier's bf16-default 3x3 rotation matmuls blow the analytic
    # 1e-5 distance tolerances below.
    from mujoco_mbrl_tpu.physics import smooth
    with jax.default_matmul_precision('highest'):
        meta = smooth.tree_meta(m)
        out = smooth.kinematics(m, jnp.asarray(qpos), meta)
        return collision.detect(m, out[3], out[4], [(g1, g2)])


_SCENE = """
<mujoco model='boxes'>
  <option timestep='0.002' gravity='0 0 -9.81'/>
  <worldbody>
    <geom name='floor' type='plane' size='5 5 .1' friction='0.7'/>
    <body name='base' pos='0 0 0.1'>
      <joint name='b1' type='free'/>
      <geom name='base' type='box' size='0.1 0.1 0.1' mass='1'
            friction='0.7'/>
    </body>
    <body name='top' pos='0 0 0.35'>
      <joint name='b2' type='free'/>
      <geom name='top' type='box' size='0.05 0.05 0.05' mass='0.3'
            friction='0.7'/>
    </body>
  </worldbody>
</mujoco>
"""


def test_box_box_distance_analytic():
    m = physics.parse(_SCENE)
    m = m.replace(opt=m.opt.replace(enable_geom_geom_contacts=True))
    base = m.name2id('geom', 'base')
    top = m.name2id('geom', 'top')
    # top box hovering 0.02 above the base box
    q = np.asarray(m.qpos0).copy()
    con = _detect_pair(m, q, base, top)
    d = np.sort(np.asarray(con.dist))
    # 4 corners of the small box at gap 0.05 above base top face (0.2):
    # top box center z=0.35, half size 0.05 -> bottom at 0.30, gap 0.10
    np.testing.assert_allclose(d[:4], 0.10, atol=1e-5)


def test_sphere_box_and_capsule_box_distance():
    xml = """
    <mujoco model='sb'>
      <worldbody>
        <body name='b'><joint type='free'/>
          <geom name='box' type='box' size='0.1 0.1 0.1' mass='1'/></body>
        <body name='s' pos='0 0 0.25'><joint type='free'/>
          <geom name='sph' type='sphere' size='0.05' mass='1'/></body>
        <body name='c' pos='0.5 0 0'><joint type='free'/>
          <geom name='cap' type='capsule' size='0.04 0.1' mass='1'/></body>
      </worldbody>
    </mujoco>
    """
    m = physics.parse(xml)
    m = m.replace(opt=m.opt.replace(enable_geom_geom_contacts=True))
    box = m.name2id('geom', 'box')
    sph = m.name2id('geom', 'sph')
    cap = m.name2id('geom', 'cap')
    q = np.asarray(m.qpos0)
    con = _detect_pair(m, q, sph, box)
    # sphere center 0.25 above box center: 0.25 - 0.1 - 0.05 = 0.10
    np.testing.assert_allclose(float(con.dist[0]), 0.10, atol=1e-5)
    con = _detect_pair(m, q, cap, box)
    # capsule axis along z at x=0.5: closest face x=0.1 -> 0.5-0.1-0.04
    np.testing.assert_allclose(np.asarray(con.dist).min(), 0.36,
                               atol=1e-5)


@pytest.mark.parametrize('solver', ['pgs', 'apgd'])
def test_box_stack_rests(solver):
    """A small box dropped onto a larger one must come to rest on top
    (z approximately base-top + half-size), not fall through or slide
    off — the stacker's core physical requirement."""
    m = physics.parse(_SCENE)
    m = m.replace(opt=m.opt.replace(enable_geom_geom_contacts=True,
                                    solver=solver))
    s = physics.make_state(m)

    def roll(s):
        def body(st, _):
            return engine.step(m, st, jnp.zeros(m.nu)), None
        return jax.lax.scan(body, s, None, length=1500)[0]

    out = jax.jit(roll)(s)
    qpos = np.asarray(out.qpos)
    base_z, top_z = qpos[2], qpos[9]
    assert abs(base_z - 0.1) < 0.02, f'base box should rest at 0.1: {base_z}'
    assert abs(top_z - 0.25) < 0.03, \
        f'top box should stack at 0.25: {top_z}'
    assert np.linalg.norm(qpos[7:9]) < 0.05, 'top box should not slide off'
