"""Camera-posed rendering fidelity tests.

The reference pins its renderer with golden PNG fixtures
(``dm_control/mujoco/testing/image_utils.py:162-186``); an analytic ray
caster can do better — depth and segmentation are checked against
closed-form geometry, which is hardware-independent and exact.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mujoco_mbrl_tpu import suite
from mujoco_mbrl_tpu.physics import engine, mjcf, model as M
from mujoco_mbrl_tpu.utils.raycast import Camera, cast


def _scene(extra=''):
    xml = f"""
<mujoco model='scene'>
  <worldbody>
    <camera name='front' pos='0 -3 1' xyaxes='1 0 0 0 0 1'/>
    <geom name='floor' type='plane' pos='0 0 0' size='5 5 .1'/>
    <body name='b' pos='0 0 1'>
      <geom name='ball' type='sphere' size='.5'/>
    </body>
    {extra}
  </worldbody>
</mujoco>"""
    m = mjcf.parse(xml)
    state = M.make_state(m)
    data = engine.forward(m, state, jnp.zeros((m.nu,)))
    return m, data


def test_center_pixel_depth_exact():
    m, data = _scene()
    cam = Camera(m, height=65, width=65, camera_id='front')
    depth = cam.render(data, depth=True)
    # camera at (0,-3,1) looking along +y at the sphere center (0,0,1):
    # center-pixel depth = 3 - r = 2.5 exactly
    np.testing.assert_allclose(float(depth[32, 32]), 2.5, atol=1e-3)


def test_segmentation_ids():
    m, data = _scene()
    cam = Camera(m, height=33, width=33, camera_id='front')
    seg = np.asarray(cam.render(data, segmentation=True))
    ball = m.names['geom']['ball']
    floor = m.names['geom']['floor']
    assert seg[16, 16] == ball
    # bottom rows see the floor plane
    assert floor in set(seg[-1])
    # sky is background
    assert seg[0, 0] == -1


def test_box_and_capsule_hits():
    m, data = _scene(extra="""
    <body name='c' pos='1.5 0 .5'>
      <geom name='box' type='box' size='.3 .3 .5'/>
    </body>
    <body name='d' pos='-1.5 0 .5'>
      <geom name='cap' type='capsule' fromto='0 0 -.3 0 0 .3' size='.2'/>
    </body>""")
    cam = Camera(m, height=65, width=97, camera_id='front')
    seg = np.asarray(cam.render(data, segmentation=True))
    ids = set(seg.ravel())
    assert m.names['geom']['box'] in ids
    assert m.names['geom']['cap'] in ids
    depth = np.asarray(cam.render(data, depth=True))
    rgb = np.asarray(cam.render(data))
    assert rgb.shape == (65, 97, 3)
    assert np.isfinite(depth[seg >= 0]).all()
    assert (depth[seg >= 0] > 0.5).all()


def test_ray_cast_direct_sphere_normal():
    m, data = _scene()
    o = jnp.array([[0.0, -3.0, 1.0]])
    d = jnp.array([[0.0, 1.0, 0.0]])
    t, gid, n = cast(m, data, o, d)
    np.testing.assert_allclose(float(t[0]), 2.5, atol=1e-5)
    assert int(gid[0]) == m.names['geom']['ball']
    np.testing.assert_allclose(np.asarray(n[0]), [0, -1, 0], atol=1e-5)


def test_suite_camera_smoke_and_vmap():
    env = suite.load('cartpole', 'swingup')
    assert env.model.ncam >= 1
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    states, _ = jax.vmap(env.reset)(keys)
    cam = Camera(env.model, height=32, width=32, camera_id='fixed')

    def render_one(phys):
        data = engine.forward(env.model, phys, jnp.zeros((env.model.nu,)))
        return cam.render(data)

    imgs = jax.jit(jax.vmap(render_one))(states.physics)
    imgs = np.asarray(imgs)
    assert imgs.shape == (3, 32, 32, 3)
    assert np.isfinite(imgs).all()
    assert imgs.min() >= 0 and imgs.max() <= 1
    # the three random poles differ -> the images differ
    assert np.abs(imgs[0] - imgs[1]).max() > 1e-3


def test_trackcom_camera_follows_body():
    env = suite.load('walker', 'walk')
    cam = Camera(env.model, height=24, width=24, camera_id='side')
    state, _ = env.reset(jax.random.PRNGKey(0))
    data = engine.forward(env.model, state.physics,
                          jnp.zeros((env.model.nu,)))
    seg = np.asarray(cam.render(data, segmentation=True))
    # the walker fills part of the tracked view
    assert (seg >= 0).sum() > 10


def test_movable_camera_poses():
    from mujoco_mbrl_tpu.utils.raycast import MovableCamera
    m, data = _scene()
    cam = MovableCamera(m, height=24, width=32, lookat=(0, 0, 1),
                        distance=3.0, azimuth=90.0, elevation=0.0)
    # azimuth 90, elevation 0 -> camera at (0, -3, 1) looking along +y:
    # the unit sphere at (0,0,1) fills the image center; center depth
    # equals distance - radius
    depth = cam.render(data, depth=True)
    np.testing.assert_allclose(float(depth[12, 16]), 3.0 - 0.5, atol=0.02)
    # look from above: center pixel now sees the sphere's top
    cam.set_pose((0, 0, 1), 2.0, 0.0, -90.0)
    depth2 = cam.render(data, depth=True)
    np.testing.assert_allclose(float(depth2[12, 16]), 2.0 - 0.5, atol=0.02)
    seg = cam.render(data, segmentation=True)
    ball_id = m.names['geom']['ball']
    assert int(seg[12, 16]) == ball_id
