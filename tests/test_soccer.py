"""Soccer-lite: n-vs-n gameplay contract (locomotion/soccer analogue).

Covers the reference's task_test.py assertions that survive the
functional redesign: per-player +1/-1 rewards and termination on a
goal (soccer/task.py:134-180), kickoff placement in own halves, the
egocentric observable frame, and the multi-agent action surface.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mujoco_mbrl_tpu.locomotion import soccer
from mujoco_mbrl_tpu.physics import engine, make_state


@pytest.fixture(scope='module')
def env1v1():
    return soccer.load(team_size=1, time_limit=5.0)


def test_load_rejects_bad_team_size():
    with pytest.raises(ValueError):
        soccer.Soccer(team_size=0)
    with pytest.raises(ValueError):
        soccer.Soccer(team_size=12)


def test_build_reset_step_1v1(env1v1):
    env = env1v1
    m = env.model
    assert m.nu == 6  # 3 thruster actions x 2 players
    state, ts = jax.jit(env.reset)(jax.random.PRNGKey(0))
    obs = ts.observation
    for key in ('home0/ball_ego', 'home0/opponent_goal_ego',
                'home0/own_goal_ego', 'home0/opponents_ego',
                'away0/ball_ego', 'ball/position', 'ball/velocity',
                'stats_ball_distances', 'stats_possession',
                'home0/velocity', 'home0/orientation'):
        assert key in obs, sorted(obs)
    assert obs['stats_possession'].shape == (2,)

    def body(st, k):
        a = jax.random.uniform(k, (m.nu,), minval=-1, maxval=1)
        st, ts = env.step(st, a)
        return st, (ts.reward, st.physics.qpos)

    _, (rew, qpos) = jax.jit(
        lambda s, ks: jax.lax.scan(body, s, ks))(
            state, jax.random.split(jax.random.PRNGKey(1), 20))
    assert rew.shape == (20, 2)  # per-player reward vector
    assert np.isfinite(np.asarray(rew)).all()
    assert np.isfinite(np.asarray(qpos)).all()


def test_kickoff_own_halves(env1v1):
    task = soccer.Soccer(team_size=2)
    env = soccer.load(team_size=2)
    m = env.model
    for seed in range(3):
        state, _ = jax.jit(env.reset)(jax.random.PRNGKey(seed))
        data = engine.forward(m, state.physics, jnp.zeros((m.nu,)))
        for i in range(2):
            hx = m.names['body'][f'home{i}/root']
            ax = m.names['body'][f'away{i}/root']
            assert float(data.xpos[hx, 0]) <= 0.0
            assert float(data.xpos[ax, 0]) >= 0.0


def test_goal_scores_and_terminates(env1v1):
    env = env1v1
    m = env.model
    task = soccer.Soccer(team_size=1)
    menv = soccer.load(team_size=1)  # fresh model for direct task calls
    mm = menv.model
    ja = mm.names['joint']['ball/root']
    ba = int(mm.jnt_qposadr[ja])
    half_len = task.pitch.size[0] / 2
    st = make_state(mm)

    # ball inside the away (+x) goal mouth: HOME scores +1, AWAY -1
    st_goal = st.replace(qpos=st.qpos.at[ba].set(half_len + 0.25))
    data = engine.forward(mm, st_goal, jnp.zeros((mm.nu,)))
    r = np.asarray(task.get_reward(mm, st_goal, data, None))
    np.testing.assert_array_equal(r, [1.0, -1.0])
    done, disc = task.get_termination(mm, st_goal, data)
    assert bool(done) and float(disc) == 0.0

    # ball in the home (-x) goal: AWAY scores
    st_own = st.replace(qpos=st.qpos.at[ba].set(-half_len - 0.25))
    data = engine.forward(mm, st_own, jnp.zeros((mm.nu,)))
    np.testing.assert_array_equal(
        np.asarray(task.get_reward(mm, st_own, data, None)), [-1.0, 1.0])

    # wide of the posts (same x, y outside the mouth): no goal
    _, _, y_half = task.pitch.goal_rect('away')
    st_wide = st.replace(
        qpos=st.qpos.at[ba].set(half_len + 0.25)
                 .at[ba + 1].set(y_half + 0.5))
    data = engine.forward(mm, st_wide, jnp.zeros((mm.nu,)))
    np.testing.assert_array_equal(
        np.asarray(task.get_reward(mm, st_wide, data, None)), [0.0, 0.0])
    done, _ = task.get_termination(mm, st_wide, data)
    assert not bool(done)

    # end-to-end: stepping from a scored state reports LAST, discount 0
    state, _ = env.reset(jax.random.PRNGKey(0))
    jb = m.names['joint']['ball/root']
    qa = int(m.jnt_qposadr[jb])
    phys = state.physics.replace(
        qpos=state.physics.qpos.at[qa].set(half_len + 0.25)
                                .at[qa + 1].set(0.0))
    state = state.replace(physics=phys)
    _, ts = env.step(state, jnp.zeros((m.nu,)))
    assert bool(ts.last())
    assert float(ts.discount) == 0.0
    np.testing.assert_array_equal(np.asarray(ts.reward), [1.0, -1.0])


def test_egocentric_frame(env1v1):
    """At yaw=0 ego == world offset; at yaw=pi/2 axes rotate."""
    task = soccer.Soccer(team_size=1)
    env = soccer.load(team_size=1)
    m = env.model
    st = make_state(m)
    jx = m.names['joint']['home0/root_x']
    jy = m.names['joint']['home0/root_y']
    js = m.names['joint']['home0/steer']
    jb = m.names['joint']['ball/root']
    qpos = (st.qpos.at[int(m.jnt_qposadr[jx])].set(1.0)
                  .at[int(m.jnt_qposadr[jy])].set(-2.0)
                  .at[int(m.jnt_qposadr[jb])].set(3.0)
                  .at[int(m.jnt_qposadr[jb]) + 1].set(1.0))
    st0 = st.replace(qpos=qpos)
    data = engine.forward(m, st0, jnp.zeros((m.nu,)))
    obs = task.observables()
    ego = np.asarray(obs['home0/ball_ego'](m, st0, data))
    np.testing.assert_allclose(ego, [2.0, 3.0], atol=1e-5)

    # yaw = +pi/2: world +x maps to ego -y, world +y to ego +x
    st90 = st.replace(
        qpos=qpos.at[int(m.jnt_qposadr[js])].set(jnp.pi / 2))
    data = engine.forward(m, st90, jnp.zeros((m.nu,)))
    ego = np.asarray(obs['home0/ball_ego'](m, st90, data))
    np.testing.assert_allclose(ego, [3.0, -2.0], atol=1e-5)


def test_2v2_surface():
    env = soccer.load(team_size=2)
    m = env.model
    assert m.nu == 12
    _, ts = jax.jit(env.reset)(jax.random.PRNGKey(3))
    obs = ts.observation
    assert obs['home1/teammates_ego'].shape == (2,)
    assert obs['home0/opponents_ego'].shape == (4,)
    assert obs['stats_possession'].shape == (4,)


def test_ball_rolls_and_possession_tracks():
    """Pushing the ball toward a player flips possession to them."""
    env = soccer.load(team_size=1)
    m = env.model
    task = soccer.Soccer(team_size=1)
    st = make_state(m)
    jx = m.names['joint']['home0/root_x']
    jb = m.names['joint']['ball/root']
    qpos = (st.qpos.at[int(m.jnt_qposadr[jx])].set(-1.0)
                  .at[int(m.jnt_qposadr[jb])].set(-1.2))
    st = st.replace(qpos=qpos)
    data = engine.forward(m, st, jnp.zeros((m.nu,)))
    poss = np.asarray(task.stats_possession(m, st, data))
    np.testing.assert_array_equal(poss, [1.0, 0.0])


def test_randomized_pitch_moves_walls_and_goals():
    """RandomizedPitch (pitch.py:220): per-episode size via model
    overrides; walls/posts move and goal sensing tracks them."""
    from mujoco_mbrl_tpu import composer
    task = soccer.Soccer(team_size=1, pitch=soccer.RandomizedPitch(
        min_size=(6.0, 4.0), max_size=(12.0, 9.0)))
    env = composer.make_env(task, time_limit=5.0)
    m = env.model
    walls = []
    for seed in (0, 1, 2):
        state, _ = jax.jit(env.reset)(jax.random.PRNGKey(seed))
        m_ep = task.apply_params(m, state.params)
        g = m.names['geom']['wall_px']
        wx = float(m_ep.geom_pos[g, 0])
        assert 4.0 <= wx <= 7.0  # half_len+1 within [6/2+1, 12/2+1]
        walls.append(wx)
        # posts sit on the sampled goal line with the sampled mouth
        half_len = wx - 1.0
        p = m.names['geom']['away_post_p']
        np.testing.assert_allclose(float(m_ep.geom_pos[p, 0]), half_len,
                                   atol=1e-5)
        gw = float(m_ep.geom_pos[p, 1])
        assert 0.0 < gw < 4.5 * soccer._GOAL_LENGTH_RATIO + 1e-6
        # a ball just past the sampled line scores under THIS episode's
        # model and does not under a differently-sized one
        jb = int(m.jnt_qposadr[m.names['joint']['ball/root']])
        st = make_state(m)
        st = st.replace(qpos=st.qpos.at[jb].set(half_len + 0.25))
        data = engine.forward(m_ep, st, jnp.zeros((m.nu,)))
        np.testing.assert_array_equal(
            np.asarray(task.get_reward(m_ep, st, data, None)), [1, -1])
        # players spawned inside the sampled halves
        data0 = engine.forward(m_ep, state.physics, jnp.zeros((m.nu,)))
        for name in ('home0/root', 'away0/root'):
            b = m.names['body'][name]
            assert abs(float(data0.xpos[b, 0])) <= half_len
    assert len(set(round(w, 3) for w in walls)) > 1  # sizes vary
