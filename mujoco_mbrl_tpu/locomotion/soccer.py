"""Soccer-lite: n-vs-n multi-agent ball game on a walled pitch.

Functional redesign of the reference's ``locomotion/soccer`` stack
(``soccer/task.py``, ``soccer/pitch.py``, ``soccer/soccer_ball.py``,
``soccer/boxhead.py``) on composer-lite entities. The gameplay contract
is the reference's: per-player rewards of +1/-1 on a goal and 0
otherwise (task.py:134-162), discount 0 and episode termination when
either goal detects the ball (task.py:170-180), goal length 0.33x pitch
width (pitch.py:177-185), ball radius 0.35 / mass 0.045
(soccer_ball.py:42), and a throw-in style randomized kickoff
(task.py:115-121, initializers.py UniformInitializer).

Pitch scale is a deliberate redesign, NOT the reference contract: the
reference's ``Pitch(size=(12, 9))`` values are MuJoCo half-extents (a
24x18 field with goals inset inside the field line, pitch.py:37-38);
here ``size=(12, 9)`` is the *full* extent (12x9 playable area, goals
on the boundary walls). The half-scale pitch keeps the boxhead-lite
players' episode lengths short for batched training; ball-to-pitch
proportions are therefore ~2x the reference's.

What is redesigned for the batched pure-function engine rather than
ported:

* Goal/off-court sensing is a pure function of the ball's world
  position against static goal rectangles (XLA-friendly booleans),
  not stateful ``PositionDetector`` entities polled between steps.
* The walker is a planar thruster box ("boxhead-lite": slide x/y +
  yaw hinge, velocity-style motors) instead of the reference's
  wheeled BoxHead asset XML — same role (a fast, contact-simple
  player body), trivially batchable, 3 actions per player.
* Ball possession statistics (``soccer_ball.py:94-151`` contact
  trackers) are exposed as instantaneous observables (per-player ball
  distance and a closest-player one-hot) instead of cross-step hit /
  interception counters: the pure per-step protocol carries no side
  state, and interception stats are recoverable from the trajectory.
* Walls fully enclose the pitch, so the off-court throw-in branch
  (task.py:182-187) cannot trigger and is not carried.

``load(team_size)`` mirrors ``soccer/__init__.py:64``'s entry point and
returns the same pure-function environment every suite task uses; the
multi-agent surface is the concatenated (3 * 2n,) action vector and
per-player observable groups ``home0/...``, ``away0/...``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import composer
from ..physics import builder

_PITCH_SIZE = (12.0, 9.0)       # pitch.py:37 _DEFAULT_PITCH_SIZE
_GOAL_LENGTH_RATIO = 0.33       # pitch.py:38 goal length / pitch width
_BALL_RADIUS = 0.35             # soccer_ball.py:42
_BALL_MASS = 0.045
_RGBA_HOME = [0.1, 0.1, 0.8, 1.0]
_RGBA_AWAY = [0.8, 0.1, 0.1, 1.0]


class Pitch(composer.Entity):
    """Walled soccer pitch; goals are +x (away's) and -x (home's).

    The reference builds goals as PositionDetector props
    (pitch.py:138-156); here the goal mouths are static rectangles the
    task tests the ball position against, plus posts as physical geoms
    so shots near a post deflect.
    """

    def _build(self, size=_PITCH_SIZE, goal_size=None, wall_height=2.0,
               timestep=0.005):
        self.size = size
        half_len, half_wid = size[0] / 2, size[1] / 2
        # (depth, half-length-of-mouth, height) as pitch.py:177-185
        self.goal_size = goal_size or (0.5, size[1] * _GOAL_LENGTH_RATIO / 2,
                                       0.5)
        root = builder.RootElement(model='pitch')
        root.option(timestep=timestep)
        wb = root.worldbody
        wb.add('geom', name='field', type='plane',
               size=[half_len + 1, half_wid + 1, 0.1], friction=[0.7])
        for name, pos, zaxis, sz in (
                ('wall_px', [half_len + 1, 0, wall_height / 2],
                 [-1, 0, 0], [half_wid + 1, wall_height, 0.1]),
                ('wall_nx', [-half_len - 1, 0, wall_height / 2],
                 [1, 0, 0], [half_wid + 1, wall_height, 0.1]),
                ('wall_py', [0, half_wid + 1, wall_height / 2],
                 [0, -1, 0], [half_len + 1, wall_height, 0.1]),
                ('wall_ny', [0, -half_wid - 1, wall_height / 2],
                 [0, 1, 0], [half_len + 1, wall_height, 0.1])):
            wb.add('geom', name=name, type='plane', pos=pos, zaxis=zaxis,
                   size=sz)
        gd, gw, gh = self.goal_size
        for side, sx in (('home', -1.0), ('away', 1.0)):
            for post, py in ((f'{side}_post_n', -gw), (f'{side}_post_p', gw)):
                wb.add('geom', name=post, type='cylinder', size=[0.08],
                       fromto=[sx * half_len, py, 0, sx * half_len, py, gh])
        return root

    def goal_rect(self, side: str):
        """(x_lo, x_hi, y_half) of `side`'s goal mouth in world frame
        (the build-time geometry; episode overrides read the model)."""
        half_len = self.size[0] / 2
        gd, gw, _ = self.goal_size
        if side == 'home':
            return (-half_len - gd, -half_len, gw)
        return (half_len, half_len + gd, gw)

    def goal_rect_in(self, model, side: str):
        """Goal mouth derived from the (possibly episode-overridden)
        model: the posts carry the goal line x and mouth half-width y."""
        g = model.names['geom'][f'{side}_post_p']
        x_line = model.geom_pos[g, 0]
        y_half = jnp.abs(model.geom_pos[g, 1])
        gd = self.goal_size[0]
        sign = -1.0 if side == 'home' else 1.0
        return x_line, x_line + sign * gd, y_half

    def episode_size(self, params):
        """(length, width) for this episode; fixed pitches ignore params."""
        return self.size


class RandomizedPitch(Pitch):
    """Pitch whose size is re-sampled every episode (pitch.py:220
    RandomizedPitch), redesigned for static compiled shapes: the scene
    is built once at ``max_size`` and per-episode sizes move the walls
    and posts through the functional model-override path
    (``apply_params``), the same mechanism suite tasks use for episode
    variation. Goal sensing reads the overridden post positions, so
    rewards track the sampled geometry with zero recompilation."""

    def _build(self, min_size=(6.0, 4.0), max_size=_PITCH_SIZE,
               keep_aspect_ratio=False, **kwargs):
        self.min_size = min_size
        self.max_size = max_size
        self.keep_aspect_ratio = keep_aspect_ratio
        return super()._build(size=max_size, **kwargs)

    def initialize_episode(self, model, key):
        ratios = jax.random.uniform(key, (2,))
        if self.keep_aspect_ratio:  # pitch.py:275-281
            ratios = jnp.full((2,), ratios[0])
        return ratios

    def episode_size(self, params):
        lo = jnp.asarray(self.min_size)
        hi = jnp.asarray(self.max_size)
        return lo + params * (hi - lo)  # pitch.py:282

    def apply_params(self, model, params):
        length, width = self.episode_size(params)
        half_len, half_wid = length / 2, width / 2
        gw = width * _GOAL_LENGTH_RATIO / 2
        gp = model.geom_pos
        names = model.names['geom']
        for name, xy in (('wall_px', (half_len + 1, None)),
                         ('wall_nx', (-half_len - 1, None)),
                         ('wall_py', (None, half_wid + 1)),
                         ('wall_ny', (None, -half_wid - 1)),
                         ('home_post_n', (-half_len, -gw)),
                         ('home_post_p', (-half_len, gw)),
                         ('away_post_n', (half_len, -gw)),
                         ('away_post_p', (half_len, gw))):
            g = names[name]
            if xy[0] is not None:
                gp = gp.at[g, 0].set(xy[0])
            if xy[1] is not None:
                gp = gp.at[g, 1].set(xy[1])
        return model.replace(geom_pos=gp)


class SoccerBall(composer.Entity):
    """Free sphere with the reference ball's radius/mass
    (soccer_ball.py:42: radius=0.35, mass=0.045)."""

    def _build(self, radius=_BALL_RADIUS, mass=_BALL_MASS):
        self.radius = radius
        root = builder.RootElement(model='soccer_ball')
        body = root.worldbody.add('body', name='ball', pos=[0, 0, radius])
        body.add('joint', name='root', type='free')
        body.add('geom', name='ball', type='sphere', size=[radius],
                 mass=mass, friction=[0.7])
        return root

    def body_id(self, model):
        return model.names['body'][self.name('ball')]

    def dof_adr(self, model):
        j = model.names['joint'][self.name('root')]
        return int(model.jnt_dofadr[j])

    def qpos_adr(self, model):
        j = model.names['joint'][self.name('root')]
        return int(model.jnt_qposadr[j])

    @composer.observable
    def position(self, model, phys, data):
        return data.xpos[self.body_id(model)]

    @composer.observable
    def velocity(self, model, phys, data):
        d = self.dof_adr(model)
        return phys.qvel[d:d + 3]


class BoxHead(composer.Entity):
    """Boxhead-lite player: a marked box with a head sphere, driven by
    planar thrusters (slide x/y velocity motors) and a yaw spinner —
    the reference BoxHead's role (boxhead.py:108: a contact-simple fast
    player) without its wheeled asset XML."""

    def _build(self, marker_rgba=None, box_size=0.2, gear=8.0):
        root = builder.RootElement(model='boxhead')
        body = root.worldbody.add('body', name='root',
                                  pos=[0, 0, box_size])
        body.add('joint', name='root_x', type='slide', axis=[1, 0, 0],
                 limited=False, damping=2.0)
        body.add('joint', name='root_y', type='slide', axis=[0, 1, 0],
                 limited=False, damping=2.0)
        body.add('joint', name='steer', type='hinge', axis=[0, 0, 1],
                 limited=False, damping=0.5)
        kw = {'rgba': marker_rgba} if marker_rgba else {}
        body.add('geom', name='torso', type='box',
                 size=[box_size, box_size, box_size], mass=3.0,
                 friction=[0.7], **kw)
        body.add('geom', name='head', type='sphere', size=[box_size / 2],
                 pos=[box_size, 0, box_size], mass=0.1, **kw)
        for j, g in (('root_x', gear), ('root_y', gear), ('steer', 2.0)):
            root.actuator.add('motor', name=j, joint=j, gear=g,
                              ctrllimited=True, ctrlrange=[-1, 1])
        return root

    def body_id(self, model):
        return model.names['body'][self.name('root')]

    def _adr(self, model, joint):
        j = model.names['joint'][self.name(joint)]
        return int(model.jnt_qposadr[j]), int(model.jnt_dofadr[j])

    def root_xy(self, model, phys, data):
        return data.xpos[self.body_id(model), :2]

    def yaw(self, model, phys, data):
        qadr, _ = self._adr(model, 'steer')
        return phys.qpos[qadr]

    @composer.observable
    def velocity(self, model, phys, data):
        adrs = [self._adr(model, j)[1]
                for j in ('root_x', 'root_y', 'steer')]
        return phys.qvel[jnp.array(adrs)]

    @composer.observable
    def orientation(self, model, phys, data):
        yaw = self.yaw(model, phys, data)
        return jnp.stack([jnp.cos(yaw), jnp.sin(yaw)])


class Soccer(composer.Task):
    """n-vs-n soccer (soccer/task.py Task): players 0..n-1 are HOME
    (defend -x goal, score at +x), n..2n-1 are AWAY."""

    control_timestep = 0.025

    def __init__(self, team_size: int = 1, pitch: Pitch = None,
                 spawn_margin: float = 1.0):
        if not 1 <= team_size <= 11:
            raise ValueError('team_size must be within [1, 11]: '
                             f'{team_size}')  # soccer/__init__.py:85
        pitch = pitch or Pitch()
        super().__init__(pitch)
        self.pitch = pitch
        self.team_size = team_size
        self.ball = self.attach(SoccerBall(), 'ball/')
        self.players = []
        for team, rgba in (('home', _RGBA_HOME), ('away', _RGBA_AWAY)):
            for i in range(team_size):
                self.players.append(self.attach(
                    BoxHead(marker_rgba=rgba), f'{team}{i}/'))
        # +1 for HOME players, -1 for AWAY: HOME scores in the away goal
        self._team_sign = jnp.concatenate([
            jnp.ones(team_size), -jnp.ones(team_size)])
        self._spawn_margin = spawn_margin

    # -- kickoff (task.py:115-121 throw-in + UniformInitializer) --------
    def initialize_episode(self, model, key):
        from ..physics import make_state
        state = make_state(model)
        kb, kp, ky, kpi = jax.random.split(key, 4)
        # pitch episode params (RandomizedPitch samples its size here);
        # spawns below use the same episode's extents
        pitch_params = self.pitch.initialize_episode(model, kpi)
        length, width = self.pitch.episode_size(pitch_params)
        qpos = state.qpos
        # ball: near the center spot, resting on the field
        ball_xy = jax.random.uniform(kb, (2,), minval=-1.0, maxval=1.0)
        ba = self.ball.qpos_adr(model)
        qpos = qpos.at[ba:ba + 2].set(ball_xy)
        qpos = qpos.at[ba + 2].set(self.ball.radius)
        # players: uniform in their own half, random heading
        half_len = length / 2 - self._spawn_margin
        half_wid = width / 2 - self._spawn_margin
        n = len(self.players)
        u = jax.random.uniform(kp, (n, 2), minval=-1.0, maxval=1.0)
        # own half: HOME x in [-half_len, 0), AWAY x in (0, half_len]
        own = -self._team_sign  # HOME -> -1 (negative x half)
        xy = jnp.stack([own * (1.0 + u[:, 0]) * half_len / 2,
                        u[:, 1] * half_wid], axis=-1)
        yaws = jax.random.uniform(ky, (n,), minval=-jnp.pi, maxval=jnp.pi)
        for i, p in enumerate(self.players):
            xa, _ = p._adr(model, 'root_x')
            ya, _ = p._adr(model, 'root_y')
            sa, _ = p._adr(model, 'steer')
            qpos = qpos.at[xa].set(xy[i, 0])
            qpos = qpos.at[ya].set(xy[i, 1])
            qpos = qpos.at[sa].set(yaws[i])
        # params aligned with self._entities: (pitch, ball, *players)
        params = (pitch_params,) + ((),) * (len(self._entities) - 1)
        return state.replace(qpos=qpos), params

    # -- goal sensing (pitch.py:192-201, made pure) ---------------------
    def _ball_xy(self, model, phys, data):
        return data.xpos[self.ball.body_id(model), :2]

    def _in_goal(self, model, xy, side):
        x_line, x_back, y_half = self.pitch.goal_rect_in(model, side)
        x_lo = jnp.minimum(x_line, x_back)
        x_hi = jnp.maximum(x_line, x_back)
        return ((xy[0] >= x_lo) & (xy[0] <= x_hi)
                & (jnp.abs(xy[1]) <= y_half))

    def scored(self, model, phys, data):
        """+1 if HOME scored (ball in the away goal), -1 if AWAY did,
        0 otherwise — ``detected_goal`` (pitch.py:192) as a sign."""
        xy = self._ball_xy(model, phys, data)
        home_scored = self._in_goal(model, xy, 'away')
        away_scored = self._in_goal(model, xy, 'home')
        return (home_scored.astype(jnp.float32)
                - away_scored.astype(jnp.float32))

    # -- rewards / termination (task.py:134-180) ------------------------
    def get_reward(self, model, phys, data, ctrl):
        """Per-player reward vector: +1 scored / -1 conceded / 0."""
        return self.scored(model, phys, data) * self._team_sign

    def get_termination(self, model, phys, data):
        goal = self.scored(model, phys, data) != 0
        return goal, jnp.zeros((), phys.qpos.dtype)

    # -- per-player egocentric observables ------------------------------
    # (observables.py CoreObservablesAdder: ball / goals / team-mates /
    # opponents in each player's frame, yaw-rotated)
    def _ego(self, p, model, phys, data, world_xy):
        yaw = p.yaw(model, phys, data)
        d = world_xy - p.root_xy(model, phys, data)
        c, s = jnp.cos(yaw), jnp.sin(yaw)
        return jnp.stack([c * d[..., 0] + s * d[..., 1],
                          -s * d[..., 0] + c * d[..., 1]], axis=-1)

    def observables(self):
        out = dict(super().observables())

        def ego_ball(p):
            def fn(model, phys, data):
                return self._ego(p, model, phys, data,
                                 self._ball_xy(model, phys, data))
            return fn

        def ego_goal(p, side):
            def fn(model, phys, data):
                x_line, x_back, _ = self.pitch.goal_rect_in(model, side)
                center = jnp.stack([(x_line + x_back) / 2,
                                    jnp.zeros_like(x_line)])
                return self._ego(p, model, phys, data, center)
            return fn

        def ego_others(p, others):
            def fn(model, phys, data):
                xy = jnp.stack([o.root_xy(model, phys, data)
                                for o in others])
                return self._ego(p, model, phys, data, xy).ravel()
            return fn

        n = self.team_size
        for i, p in enumerate(self.players):
            own = 'home' if i < n else 'away'
            opp = 'away' if i < n else 'home'
            mates = [q for j, q in enumerate(self.players)
                     if j != i and (j < n) == (i < n)]
            opps = [q for j, q in enumerate(self.players)
                    if (j < n) != (i < n)]
            out[p.prefix + 'ball_ego'] = ego_ball(p)
            out[p.prefix + 'own_goal_ego'] = ego_goal(p, own)
            out[p.prefix + 'opponent_goal_ego'] = ego_goal(p, opp)
            if mates:
                out[p.prefix + 'teammates_ego'] = ego_others(p, mates)
            out[p.prefix + 'opponents_ego'] = ego_others(p, opps)
        return out

    # -- possession stats (soccer_ball.py trackers, instantaneous) ------
    @composer.observable
    def stats_ball_distances(self, model, phys, data):
        ball = self._ball_xy(model, phys, data)
        xy = jnp.stack([p.root_xy(model, phys, data)
                        for p in self.players])
        return jnp.linalg.norm(xy - ball, axis=-1)

    @composer.observable
    def stats_possession(self, model, phys, data):
        d = self.stats_ball_distances(model, phys, data)
        return jax.nn.one_hot(jnp.argmin(d), len(self.players))


def load(team_size: int = 1, time_limit: float = 45.0, **task_kwargs):
    """n-vs-n soccer environment (soccer/__init__.py:64 load)."""
    task = Soccer(team_size=team_size, **task_kwargs)
    return composer.make_env(task, time_limit=time_limit)
