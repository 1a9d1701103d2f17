"""Quadruped domain: walk / run / escape / fetch.

Task contract from the reference (``dm_control/dm_control/suite/
quadruped.py``); model constants transcribed from its ``quadruped.xml``
(walls/ball/target/terrain/rangefinders pruned exactly like the
reference's ``make_model`` does per task). The `escape` task runs on
procedurally-bumpy heightfield terrain with rangefinder observations
(see :class:`Escape` below and ``physics/collision.py`` hfield kernels).

Engine features this domain exercises: filtered (stateful) actuators
(dyntype='filter', State.act), fixed-tendon transmissions and tendon
equality couplings, ellipsoid torso vs plane contact, and the IMU /
force-torque sensor suite (suite.sensors).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..physics import collision, make_state, mjcf, smooth
from . import base, control, rewards, sensors
from .registry import TaggedTasks

SUITE = TaggedTasks()
_DEFAULT_TIME_LIMIT = 20
_CONTROL_TIMESTEP = .02
_RUN_SPEED = 5
_WALK_SPEED = 0.5

_LEGS = ['front_left', 'front_right', 'back_right', 'back_left']
_LEG_EULER = {'front_left': '0 0 45', 'front_right': '0 0 -45',
              'back_right': '0 0 -135', 'back_left': '0 0 135'}
_LEG_POS = {'front_left': '.2 .2 0', 'front_right': '.2 -.2 0',
            'back_right': '-.2 -.2 0', 'back_left': '-.2 .2 0'}


def _leg_xml(leg: str) -> str:
    return f"""
      <body name='hip_{leg}' pos='{_LEG_POS[leg]}' euler='{_LEG_EULER[leg]}'
            childclass='hip'>
        <joint name='yaw_{leg}' class='yaw'/>
        <joint name='pitch_{leg}' class='pitch'/>
        <geom name='thigh_{leg}'/>
        <body name='knee_{leg}' pos='.3 0 .11' childclass='knee'>
          <joint name='knee_{leg}'/>
          <geom name='shin_{leg}'/>
          <body name='ankle_{leg}' pos='.25 0 -.25' childclass='ankle'>
            <joint name='ankle_{leg}'/>
            <geom name='foot_{leg}'/>
            <body name='toe_{leg}' pos='0 0 -.3' childclass='toe'>
              <geom name='toe_{leg}'/>
              <site name='toe_{leg}'/>
            </body>
          </body>
        </body>
      </body>"""


def _tendon_xml(leg: str) -> str:
    return f"""
    <fixed name='coupling_{leg}'>
      <joint joint='pitch_{leg}' coef='.333'/>
      <joint joint='knee_{leg}' coef='.333'/>
      <joint joint='ankle_{leg}' coef='.333'/>
    </fixed>
    <fixed name='extend_{leg}'>
      <joint joint='pitch_{leg}' coef='.25'/>
      <joint joint='knee_{leg}' coef='-.5'/>
      <joint joint='ankle_{leg}' coef='.25'/>
    </fixed>
    <fixed name='lift_{leg}'>
      <joint joint='pitch_{leg}' coef='.5'/>
      <joint joint='ankle_{leg}' coef='-.5'/>
    </fixed>"""


def _actuator_xml(leg: str) -> str:
    return f"""
    <general name='yaw_{leg}' class='yaw_act' joint='yaw_{leg}'/>
    <general name='lift_{leg}' class='lift_act' tendon='lift_{leg}'/>
    <general name='extend_{leg}' class='extend_act' tendon='extend_{leg}'/>"""


def _make_xml(floor_size: float, walls_and_ball: bool = False,
              terrain: bool = False) -> str:
    extras = ''
    asset = ''
    if terrain:
        asset = ("<asset><hfield name='terrain' nrow='201' ncol='201' "
                 "size='30 30 5 .1'/></asset>")
        extras += "\n    <geom name='terrain' type='hfield' pos='0 0 -.01'/>"
    extras_post = ''
    if walls_and_ball:
        # Wall positions/sizes are the quadruped.xml:78-81 literals (floor
        # size 15); the ball body comes AFTER the torso, matching the XML
        # body order (quadruped.xml:199) so the free-joint qpos layout is
        # [torso root, legs..., ball_root].
        fs = floor_size
        extras = f"""
    <geom name='wall_px' type='plane' pos='-{fs + .7} 0 .7'
          zaxis='1 0 1' size='1 {fs} .5'/>
    <geom name='wall_py' type='plane' pos='0 -{fs + .7} .7'
          zaxis='0 1 1' size='{fs} 1 .5'/>
    <geom name='wall_nx' type='plane' pos='{fs + .7} 0 .7'
          zaxis='-1 0 1' size='1 {fs} .5'/>
    <geom name='wall_ny' type='plane' pos='0 {fs + .7} .7'
          zaxis='0 -1 1' size='{fs} 1 .5'/>
    <site name='target' type='cylinder' size='.4 .06' pos='0 0 .05'/>"""
        extras_post = """
    <body name='ball' pos='0 0 3'>
      <freejoint name='ball_root'/>
      <geom name='ball' type='sphere' size='.15' priority='1' condim='6'
            friction='.7 .005 .005' density='1000' solref='-10000 -30'/>
    </body>"""
    legs = ''.join(_leg_xml(leg) for leg in _LEGS)
    tendons = ''.join(_tendon_xml(leg) for leg in _LEGS)
    actuators = ''.join(_actuator_xml(leg) for leg in _LEGS)
    couplings = ''.join(
        f"<tendon name='coupling_{leg}' tendon1='coupling_{leg}' "
        f"solimp='0.95 0.99 0.01' solref='.005 .5'/>" for leg in _LEGS)
    return f"""
<mujoco model='quadruped'>
  <option timestep='.005'/>
  {asset}
  <default>
    <geom solimp='.9 .99 .003' solref='.01 1'/>
    <general ctrllimited='true' gainprm='1000' biasprm='0 -1000'
             dyntype='filter' dynprm='.1'/>
    <default class='body'>
      <geom type='capsule' size='.08' condim='1' density='500'/>
      <joint type='hinge' damping='30' armature='.01' limited='true'
             solimplimit='0 .99 .01'/>
      <default class='hip'>
        <default class='yaw'>
          <joint axis='0 0 1' range='-50 50'/>
        </default>
        <default class='pitch'>
          <joint axis='0 1 0' range='-20 60'/>
        </default>
        <geom fromto='0 0 0 .3 0 .11'/>
      </default>
      <default class='knee'>
        <joint axis='0 1 0' range='-60 50'/>
        <geom size='.065' fromto='0 0 0 .25 0 -.25'/>
      </default>
      <default class='ankle'>
        <joint axis='0 1 0' range='-45 55'/>
        <geom size='.055' fromto='0 0 0 0 0 -.25'/>
      </default>
      <default class='toe'>
        <geom type='sphere' size='.08' friction='1.5'/>
        <site type='sphere' size='.084'/>
      </default>
    </default>
    <default class='yaw_act'>
      <general ctrlrange='-1 1'/>
    </default>
    <default class='lift_act'>
      <general ctrlrange='-1 1.1'/>
    </default>
    <default class='extend_act'>
      <general ctrlrange='-.8 .8'/>
    </default>
  </default>
  <worldbody>
    <geom name='floor' type='plane' size='{floor_size} {floor_size} .5'/>
    {extras}
    <body name='torso' childclass='body' pos='0 0 .57'>
      <freejoint name='root'/>
      <site name='workspace' type='sphere' size='.3' pos='.8 0 -.2'/>
      <geom name='torso' type='ellipsoid' size='.3 .27 .2' density='1000'/>
      <site name='torso' type='sphere' size='.05'/>
      {legs}
    </body>
    {extras_post}
  </worldbody>
  <tendon>{tendons}
  </tendon>
  <equality>{couplings}
  </equality>
  <actuator>{actuators}
  </actuator>
</mujoco>
"""


# ---------------------------------------------------------------------------
# Observation helpers (reference quadruped.py Physics methods)
# ---------------------------------------------------------------------------

def _hinge_addrs(model):
    from ..physics import model as M
    qadr = [model.jnt_qposadr[j] for j in range(model.njnt)
            if model.jnt_type[j] == M.HINGE]
    dadr = [model.jnt_dofadr[j] for j in range(model.njnt)
            if model.jnt_type[j] == M.HINGE]
    return np.array(qadr), np.array(dadr)


def _common_observations(model, phys, data):
    qadr, dadr = _hinge_addrs(model)
    torso_site = model.name2id('site', 'torso')
    torso = model.name2id('body', 'torso')
    ego = jnp.concatenate([phys.qpos[qadr], phys.qvel[dadr], phys.act])
    imu = jnp.concatenate([
        sensors.accelerometer(model, data, phys.qvel, torso_site),
        sensors.gyro(model, data, torso_site)])
    ft = jnp.concatenate(
        [sensors.force_site(model, data,
                            model.name2id('site', f'toe_{leg}'))
         for leg in _LEGS]
        + [sensors.torque_site(model, data,
                               model.name2id('site', f'toe_{leg}'))
           for leg in _LEGS])
    return {
        'egocentric_state': ego,
        'torso_velocity': sensors.velocimeter(
            model, data, torso_site),
        'torso_upright': data.ximat[torso, 2, 2],
        'imu': imu,
        'force_torque': jnp.arcsinh(ft),
    }


def _upright_reward(model, data, deviation_angle: float = 0.0):
    torso = model.name2id('body', 'torso')
    deviation = float(np.cos(np.deg2rad(deviation_angle)))
    return rewards.tolerance(
        data.ximat[torso, 2, 2],
        bounds=(deviation, float('inf')),
        sigmoid='linear', margin=1 + deviation, value_at_margin=0)


def _non_contacting_qpos(model, qpos):
    """Root height so no candidate contact penetrates (jittable
    closed form of the reference's 1 cm-stepping search,
    quadruped.py:253-283: raising the free root by dz raises every
    contact distance by dz against the horizontal floor)."""
    state = make_state(model, qpos=qpos)
    meta = smooth.tree_meta(model)
    out = smooth.kinematics(model, state.qpos, meta)
    geom_xpos, geom_xmat = out[3], out[4]
    pairs = collision.candidate_pairs(
        model, include_geom_geom=model.opt.enable_geom_geom_contacts)
    floor = model.name2id('geom', 'floor')
    pairs = [p for p in pairs if floor in p]
    con = collision.detect(model, geom_xpos, geom_xmat, pairs)
    min_dist = jnp.min(con.dist)
    return qpos.at[2].add(jnp.maximum(-min_dist, 0.0) + 0.01)


_TERRAIN_RES = 201          # hfield grid resolution (reference: 201)
_TERRAIN_SIZE = 30.0        # half-extent in meters (reference: 30)
_TERRAIN_SMOOTHNESS = 0.15
_TERRAIN_BUMP_SCALE = 2.0

# rangefinder rays: (from, to) endpoints in the torso frame, transcribed
# from the reference's rf_* site fromto values (ray = site +z = to-from)
_RF_ENDPOINTS = [
    ((.41, y, z0), (x1, 0.0, z1))
    for (z0, x1, z1) in ((.11, .34, .115), (.1, .36, .11),
                         (.09, .38, .105), (.08, .40, .10))
    for y in (-.02, -.01, 0.0, .01, .02)
]


def _generate_terrain(key):
    """Sinusoidal bowl x random smooth bumps (quadruped.py Escape init)."""
    res = _TERRAIN_RES
    grid = jnp.linspace(-1.0, 1.0, res)
    radius = jnp.clip(jnp.sqrt(grid[None, :] ** 2 + grid[:, None] ** 2),
                      0.04, 1.0)
    bowl = 0.5 - jnp.cos(2 * jnp.pi * radius) / 2.0
    bump_res = int(2 * _TERRAIN_SIZE / _TERRAIN_BUMP_SCALE)
    bumps = jax.random.uniform(key, (bump_res, bump_res),
                               minval=_TERRAIN_SMOOTHNESS, maxval=1.0)
    smooth_bumps = jax.image.resize(bumps, (res, res), method='cubic')
    return bowl * smooth_bumps


def _rangefinder(model, data, qvel_unused=None, max_range=10.0,
                 n_steps: int = 64):
    """20 ray readings against the heightfield terrain, tanh-scaled with
    no-hit mapped to 1.0 (quadruped.py Physics.rangefinder)."""
    torso = model.name2id('body', 'torso')
    R = data.ximat[torso]
    p0 = data.xpos[torso]

    def one(ep):
        frm, to = jnp.asarray(ep[0]), jnp.asarray(ep[1])
        origin = p0 + R @ frm
        direction = R @ (to - frm)
        direction = direction / jnp.linalg.norm(direction)
        ts = jnp.linspace(0.0, max_range, n_steps)
        pts = origin[None] + ts[:, None] * direction[None]
        hs = jax.vmap(lambda p: collision.hfield_height_normal(
            model, p[0], p[1])[0])(pts)
        below = pts[:, 2] < hs
        below = below.at[0].set(False)      # ignore the origin sample
        hit = below.any()
        idx = jnp.maximum(jnp.argmax(below), 1)
        reading = jnp.where(hit, ts[idx], -1.0)
        return jnp.where(reading == -1.0, 1.0, jnp.tanh(reading))

    return jnp.stack([one(ep) for ep in _RF_ENDPOINTS])


class Escape(base.Task):
    """Escape the bowl-shaped terrain (quadruped.py:361-424)."""

    def initialize_episode(self, model, key):
        k1, k2 = jax.random.split(key)
        terrain = _generate_terrain(k1)
        model = model.replace(hfield_data=terrain)
        quat = jax.random.normal(k2, (4,))
        quat = quat / jnp.linalg.norm(quat)
        qpos = jnp.asarray(model.qpos0)
        qpos = qpos.at[0:3].set(jnp.zeros(3)).at[3:7].set(quat)
        qpos = _non_contacting_qpos(model, qpos)
        return make_state(model, qpos=qpos), terrain

    def apply_params(self, model, params):
        return model.replace(hfield_data=params)

    def get_observation(self, model, phys, data):
        obs = _common_observations(model, phys, data)
        torso = model.name2id('body', 'torso')
        # origin position in the torso frame (Physics.origin)
        obs['origin'] = -(data.xpos[torso] @ data.ximat[torso])
        obs['rangefinder'] = _rangefinder(model, data)
        return obs

    def get_reward(self, model, phys, data, ctrl):
        ws = model.name2id('site', 'workspace')
        escape_reward = rewards.tolerance(
            jnp.linalg.norm(data.site_xpos[ws]),
            bounds=(_TERRAIN_SIZE, float('inf')),
            margin=_TERRAIN_SIZE, value_at_margin=0, sigmoid='linear')
        return _upright_reward(model, data,
                               deviation_angle=20) * escape_reward


class Move(base.Task):
    """Move forward at a desired speed (reference quadruped.py:317-358)."""

    def __init__(self, desired_speed: float):
        self._desired_speed = desired_speed

    def initialize_episode(self, model, key):
        quat = jax.random.normal(key, (4,))
        quat = quat / jnp.linalg.norm(quat)
        qpos = jnp.asarray(model.qpos0)
        qpos = qpos.at[0:3].set(jnp.array([0.0, 0.0, 0.0]))
        qpos = qpos.at[3:7].set(quat)
        qpos = _non_contacting_qpos(model, qpos)
        return make_state(model, qpos=qpos), ()

    def get_observation(self, model, phys, data):
        return _common_observations(model, phys, data)

    def get_reward(self, model, phys, data, ctrl):
        torso_site = model.name2id('site', 'torso')
        speed = sensors.velocimeter(model, data, torso_site)[0]
        move_reward = rewards.tolerance(
            speed, bounds=(self._desired_speed, float('inf')),
            margin=self._desired_speed, value_at_margin=0.5,
            sigmoid='linear')
        return _upright_reward(model, data) * move_reward


class Fetch(base.Task):
    """Bring the ball to the target (reference quadruped.py:426-480)."""

    def __init__(self, floor_size: float):
        self._floor_size = floor_size

    def initialize_episode(self, model, key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        azimuth = jax.random.uniform(k1, (), minval=0.0,
                                     maxval=2 * jnp.pi)
        quat = jnp.stack([jnp.cos(azimuth / 2), 0.0 * azimuth,
                          0.0 * azimuth, jnp.sin(azimuth / 2)])
        spawn = 0.9 * self._floor_size
        xy = jax.random.uniform(k2, (2,), minval=-spawn, maxval=spawn)
        qpos = jnp.asarray(model.qpos0)
        qpos = qpos.at[0:2].set(xy).at[2].set(0.0).at[3:7].set(quat)
        qpos = _non_contacting_qpos(model, qpos)
        ball = model.jnt_qpos_slice('ball_root')
        ball_xy = jax.random.uniform(k3, (2,), minval=-spawn, maxval=spawn)
        qpos = qpos.at[ball.start:ball.start + 2].set(ball_xy)
        qpos = qpos.at[ball.start + 2].set(2.0)
        qvel = jnp.zeros(model.nv)
        bd = model.jnt_dof_slice('ball_root')
        qvel = qvel.at[bd.start:bd.start + 2].set(
            5.0 * jax.random.normal(k4, (2,)))
        return make_state(model, qpos=qpos, qvel=qvel), ()

    def get_observation(self, model, phys, data):
        obs = _common_observations(model, phys, data)
        torso = model.name2id('body', 'torso')
        ball = model.name2id('body', 'ball')
        frame = data.ximat[torso]
        ball_rel_pos = data.xpos[ball] - data.xpos[torso]
        bd = model.jnt_dof_slice('ball_root')
        rd = model.jnt_dof_slice('root')
        ball_rel_vel = (phys.qvel[bd.start:bd.start + 3]
                        - phys.qvel[rd.start:rd.start + 3])
        ball_rot_vel = phys.qvel[bd.start + 3:bd.start + 6]
        ball_state = jnp.stack(
            [ball_rel_pos, ball_rel_vel, ball_rot_vel]) @ frame
        target = model.name2id('site', 'target')
        obs['ball_state'] = ball_state.reshape(-1)
        obs['target_position'] = (data.site_xpos[target]
                                  - data.xpos[torso]) @ frame
        return obs

    def get_reward(self, model, phys, data, ctrl):
        arena_radius = self._floor_size * float(np.sqrt(2))
        workspace_radius = 0.3
        ball_radius = 0.15
        target_radius = 0.4
        ws = model.name2id('site', 'workspace')
        ball = model.name2id('body', 'ball')
        target = model.name2id('site', 'target')
        self_to_ball = jnp.linalg.norm(
            (data.site_xpos[ws] - data.xpos[ball])[:2])
        ball_to_target = jnp.linalg.norm(
            (data.site_xpos[target] - data.xpos[ball])[:2])
        reach_reward = rewards.tolerance(
            self_to_ball, bounds=(0, workspace_radius + ball_radius),
            sigmoid='linear', margin=arena_radius, value_at_margin=0)
        fetch_reward = rewards.tolerance(
            ball_to_target, bounds=(0, target_radius),
            sigmoid='linear', margin=arena_radius, value_at_margin=0)
        reach_then_fetch = reach_reward * (0.5 + 0.5 * fetch_reward)
        return _upright_reward(model, data) * reach_then_fetch


def _env(task, xml, time_limit, environment_kwargs, geom_geom=False):
    model = mjcf.parse(xml)
    if geom_geom:
        # Fetch's full geom-geom candidate set (~240 contacts + stiff
        # tendon couplings) conditions the dual QP badly (kappa ~ 2e5);
        # round 1 needed a PGS fallback here, but per-substep solver
        # warm starting lets the batched projected-gradient solver track
        # the MuJoCo oracle within the calibrated fetch parity threshold
        # at the default iteration budget.
        model = model.replace(opt=model.opt.replace(
            enable_geom_geom_contacts=True))
    kwargs = dict(environment_kwargs or {})
    kwargs.setdefault('control_timestep', _CONTROL_TIMESTEP)
    return control.Environment(model, task, time_limit=time_limit,
                               **kwargs)


@SUITE.add()
def walk(time_limit=_DEFAULT_TIME_LIMIT, environment_kwargs=None):
    xml = _make_xml(floor_size=_DEFAULT_TIME_LIMIT * _WALK_SPEED)
    return _env(Move(_WALK_SPEED), xml, time_limit, environment_kwargs)


@SUITE.add()
def run(time_limit=_DEFAULT_TIME_LIMIT, environment_kwargs=None):
    xml = _make_xml(floor_size=_DEFAULT_TIME_LIMIT * _RUN_SPEED)
    return _env(Move(_RUN_SPEED), xml, time_limit, environment_kwargs)


@SUITE.add()
def escape(time_limit=_DEFAULT_TIME_LIMIT, environment_kwargs=None):
    xml = _make_xml(floor_size=40, terrain=True)
    return _env(Escape(), xml, time_limit, environment_kwargs)


@SUITE.add()
def fetch(time_limit=_DEFAULT_TIME_LIMIT, environment_kwargs=None):
    # ball-quadruped interaction needs geom-geom (non-plane) contacts.
    # Fetch keeps the quadruped.xml default floor size of 15 (the reference
    # calls make_model(walls_and_ball=True) with floor_size=None,
    # quadruped.py:141).
    xml = _make_xml(floor_size=15, walls_and_ball=True)
    return _env(Fetch(floor_size=15), xml,
                time_limit, environment_kwargs, geom_geom=True)
