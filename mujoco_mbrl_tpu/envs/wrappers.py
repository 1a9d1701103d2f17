"""MBRL env wrappers: flat observations, goal handling, batched rollouts.

Reference contract: ``src/mbrl/env_wrappers.py``. Per-domain constants
(state penalties, goal weight profiles, control-timestep overrides) are
transcribed where they exist for domains implemented so far; locomotion
wrappers land with their domains.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import suite as _suite
from ..data import Rollouts
from ..suite.control import EnvState, flatten_observation


class EnvWrapper:
    """Adapts a suite Environment for the MBRL loop.

    The reference's `step -> (state, obs, reward, done)` tensors
    (env_wrappers.py:78-97) become pure batched collection functions here;
    the "state" vector is the physics flat state [qpos, qvel] unless a
    subclass feature-engineers it (env_wrappers.py:36-39).
    """

    #: subclasses may force a control timestep (e.g. Reacher 0.04s)
    override_control_timestep: Optional[float] = None

    def __init__(self, env: _suite.Environment, env_name: str,
                 task_name: str):
        self._env = env
        self._env_name = env_name
        self._task_name = task_name
        self._state_penalty = 1.0
        self.action_dim = env.model.nu
        self._action_spec = env.action_spec()
        ts_obs = env.observation_spec()
        self.observation_dim = int(sum(np.prod(s.shape) or 1
                                       for s in ts_obs.values()))
        if getattr(self, 'state_dim', None) is None:
            self.state_dim = env.model.nq + env.model.nv

    # ------------------------------------------------------------------
    @staticmethod
    def load(env_name: str, task_name: str, **kwargs) -> 'EnvWrapper':
        """Dispatch to the wrapper class for `env_name`
        (env_wrappers.py:20-34)."""
        classname = ''.join(p.capitalize() for p in env_name.split('_'))
        wrapper_class = _WRAPPERS.get(classname)
        if wrapper_class is None:
            raise NameError(f'No wrapper for {env_name}')
        env_kwargs = dict(kwargs.pop('environment_kwargs', {}) or {})
        if wrapper_class.override_control_timestep is not None:
            env_kwargs['control_timestep'] = (
                wrapper_class.override_control_timestep)
        env = _suite.load(env_name, task_name,
                          task_kwargs=kwargs or None,
                          environment_kwargs=env_kwargs or None)
        return wrapper_class(env, env_name=env_name, task_name=task_name)

    @property
    def env(self) -> _suite.Environment:
        return self._env

    def action_spec(self):
        return self._action_spec

    def observation_spec(self):
        return self._env.observation_spec()

    # -- state featurization (identity by default) ----------------------
    def get_state(self, env_state: EnvState, data=None) -> jnp.ndarray:
        """Flat physics state [qpos, qvel] (env_wrappers.py:36-39).

        `data` is the forward-dynamics product for the current state;
        per-domain wrappers use it for engineered features (speed, heights,
        touch) mirroring env_wrappers.py:288-294, 529-536 etc.
        """
        return jnp.concatenate([env_state.physics.qpos,
                                env_state.physics.qvel])

    def _observe_full(self, env_state: EnvState):
        """(state_vec, obs_vec) for the current configuration."""
        from ..physics import engine
        env = self._env
        m = env._model_with(env_state.params)
        data = engine.forward(
            m, env_state.physics,
            jnp.zeros((m.nu,), env_state.physics.qpos.dtype))
        obs = env.task.get_observation(m, env_state.physics, data)
        return self.get_state(env_state, data), flatten_observation(obs)

    def state_to_physics(self, state: jnp.ndarray):
        """Inverse of get_state for state teleporting; (qpos, qvel)."""
        nq = self._env.model.nq
        return state[:nq], state[nq:]

    # -- sampling --------------------------------------------------------
    def sample_action(self, key: jax.Array,
                      batch_shape: Tuple[int, ...] = ()) -> jnp.ndarray:
        """Uniform in ctrlrange clipped to +-3 (env_wrappers.py:50-62)."""
        lo = float(max(self._action_spec.minimum[0], -3))
        hi = float(min(self._action_spec.maximum[0], 3))
        return jax.random.uniform(
            key, tuple(batch_shape) + (self.action_dim,),
            minval=lo, maxval=hi)

    def sample_state(self, key: jax.Array) -> jnp.ndarray:
        raise NotImplementedError

    def set_goal(self, key: jax.Array) -> jnp.ndarray:
        """Sample a goal; returns the goal state vector."""
        raise NotImplementedError

    def apply_goal(self, env_state: EnvState,
                   goal_state: jnp.ndarray) -> EnvState:
        """Write the goal into episode params (e.g. aim a target geom),
        mirroring env_wrappers.py set_target/set_goal. Default: no-op."""
        return env_state

    def get_goal_weights(self) -> jnp.ndarray:
        return jnp.zeros(self.state_dim)

    # ------------------------------------------------------------------
    # Rollout collection: the parallel.py replacement
    # ------------------------------------------------------------------
    def rollout_fn(self, num_steps: int,
                   policy: Optional[Callable] = None,
                   set_state: bool = False,
                   policy_init=None) -> Callable:
        """Build `collect(key, goal_state?, initial_state?) -> Rollouts`
        for a single env; vmap/jit applied by get_rollouts.

        `policy(key, t, state_vec, obs_vec, carry) -> (action, carry)`;
        None = uniform random actions.
        """
        env = self._env

        def random_policy(key, t, state, obs, carry):
            return self.sample_action(key), carry

        pol = policy or random_policy

        def collect(key, goal_state=None, initial_state=None):
            kreset, kroll = jax.random.split(key)
            env_state, ts = env.reset(kreset)
            if initial_state is not None:
                qpos, qvel = self.state_to_physics(initial_state)
                env_state = env_state.replace(
                    physics=env_state.physics.replace(
                        qpos=qpos.astype(env_state.physics.qpos.dtype),
                        qvel=qvel.astype(env_state.physics.qvel.dtype)))
            if goal_state is not None:
                env_state = self.apply_goal(env_state, goal_state)

            s0, o0 = self._observe_full(env_state)
            carry0 = policy_init() if policy_init is not None else 0

            def step_fn(carry, inp):
                env_state, pcarry, state_vec, obs_vec = carry
                t, kt = inp
                action, pcarry = pol(kt, t, state_vec, obs_vec, pcarry)
                # step_with_data: reuse the step's own observation
                # forward for the featured state instead of paying a
                # second full forward (engine.forward) per control step
                env_state, ts, data = env.step_with_data(env_state,
                                                         action)
                s_next = self.get_state(env_state, data)
                o_next = flatten_observation(ts.observation)
                out = (s_next, o_next, action, ts.reward)
                return (env_state, pcarry, s_next, o_next), out

            keys = jax.random.split(kroll, num_steps)
            (final_env_state, *_), (states, obs, actions, rewards) = \
                jax.lax.scan(step_fn, (env_state, carry0, s0, o0),
                             (jnp.arange(num_steps), keys))

            states = jnp.concatenate([s0[None], states], 0)
            obs = jnp.concatenate([o0[None], obs], 0)
            return Rollouts(states=states[None], observations=obs[None],
                            actions=actions[None], rewards=rewards[None])

        return collect

    def get_rollout(self, key: jax.Array, num_steps: int,
                    policy: Optional[Callable] = None,
                    goal_state=None, initial_state=None,
                    policy_init=None) -> Rollouts:
        """One rollout (env_wrappers.py:100-147 semantics, jitted)."""
        fn = self.rollout_fn(num_steps, policy, policy_init=policy_init)
        return fn(key, goal_state, initial_state)

    def record_rollout(self, key: jax.Array, num_steps: int,
                       policy: Optional[Callable] = None,
                       mp4path: Optional[str] = None,
                       goal_state=None, initial_state=None,
                       policy_init=None, height: int = 128,
                       width: int = 128, plane: str = 'xz',
                       extent: float = 2.5) -> Rollouts:
        """Collect one rollout and write a video (env_wrappers.py:149-159;
        GIF — no ffmpeg in this environment).

        Like the reference (which renders MJCF camera 0), models with
        cameras render through the camera-posed ray caster
        (utils.raycast); camera-less models fall back to the SDF debug
        renderer with the `plane`/`extent` framing. Frames are rendered
        post-hoc by replaying the recorded physics trajectory through
        FK, vmapped over timesteps on-device.
        """
        from ..physics import engine
        from ..utils import render as render_mod
        from ..utils.recorder import Recorder

        env = self._env
        kq, kr = jax.random.split(key)
        rolls = self.get_rollout(kr, num_steps, policy,
                                 goal_state=goal_state,
                                 initial_state=initial_state,
                                 policy_init=policy_init)
        # Re-simulate deterministically to recover qpos for rendering
        # (rollout storage keeps featured states; see get_state).
        env_state, _ = env.reset(jax.random.split(kr)[0])
        if initial_state is not None:
            qpos, qvel = self.state_to_physics(initial_state)
            env_state = env_state.replace(
                physics=env_state.physics.replace(
                    qpos=qpos.astype(env_state.physics.qpos.dtype),
                    qvel=qvel.astype(env_state.physics.qvel.dtype)))
        if goal_state is not None:
            env_state = self.apply_goal(env_state, goal_state)

        def replay(carry, a):
            env_state = carry
            env_state, ts = env.step(env_state, a)
            return env_state, env_state.physics.qpos

        _, qposes = jax.jit(lambda s, acts: jax.lax.scan(replay, s, acts))(
            env_state, rolls.actions[0])

        m = env._model_with(env_state.params)

        if m.ncam > 0:
            from ..utils.raycast import Camera
            cam = Camera(m, height=height, width=width, camera_id=0)

            def frame(qpos):
                from ..physics import make_state
                data = engine.forward(m, make_state(m, qpos=qpos),
                                      jnp.zeros(m.nu), acc_stage=False)
                return cam.render(data)

            imgs = jax.jit(jax.vmap(frame))(qposes)
            frames = np.asarray(
                jnp.clip(imgs * 255.0, 0, 255).astype(jnp.uint8))
        else:
            def frame(qpos):
                from ..physics import make_state
                data = engine.forward(m, make_state(m, qpos=qpos),
                                      jnp.zeros(m.nu), acc_stage=False)
                return render_mod.render(m, data, height, width,
                                         plane=plane, extent=extent)

            imgs = jax.jit(jax.vmap(frame))(qposes)
            frames = render_mod.render_to_uint8(imgs)
        rec = Recorder()
        for f in frames:
            rec.record_frame(f)
        if mp4path:
            rec.make_movie(mp4path)
        return rolls

    def get_rollouts_batched(self, key: jax.Array, num_rollouts: int,
                             num_steps: int, policy_batched: Callable,
                             goal_state=None,
                             policy_init=None) -> Rollouts:
        """N lockstep rollouts where the POLICY sees the whole env batch.

        `policy_batched(key, t, state_mat (B, sd), obs_mat (B, od),
        carry) -> (actions (B, ad), carry)`. This is the collection path
        for batched planners (planners.cem_batched): one planner call per
        control step covers every env, so fused rollout kernels see a
        (B*K)-candidate problem instead of being trapped under vmap.
        Physics stepping stays vmapped per env.
        """
        env = self._env
        B = num_rollouts

        def collect(key):
            kreset, kroll = jax.random.split(key)
            env_state, _ = jax.vmap(env.reset)(
                jax.random.split(kreset, B))
            if goal_state is not None:
                env_state = jax.vmap(
                    lambda s: self.apply_goal(s, goal_state))(env_state)
            s0, o0 = jax.vmap(self._observe_full)(env_state)
            carry0 = policy_init() if policy_init is not None else 0

            def step_fn(carry, inp):
                env_state, pcarry, s, o = carry
                t, kt = inp
                actions, pcarry = policy_batched(kt, t, s, o, pcarry)
                # reuse each step's own observation forward for the
                # featured state (no second engine.forward per step)
                env_state, ts, data = jax.vmap(env.step_with_data)(
                    env_state, actions)
                s2 = jax.vmap(self.get_state)(env_state, data)
                o2 = jax.vmap(flatten_observation)(ts.observation)
                return ((env_state, pcarry, s2, o2),
                        (s2, o2, actions, ts.reward))

            keys = jax.random.split(kroll, num_steps)
            _, (states, obs, actions, rewards) = jax.lax.scan(
                step_fn, (env_state, carry0, s0, o0),
                (jnp.arange(num_steps), keys))

            # (T, B, ...) -> (B, T, ...) with the initial frame prepended
            states = jnp.concatenate([s0[None], states], 0)
            obs = jnp.concatenate([o0[None], obs], 0)
            swap = lambda x: jnp.swapaxes(x, 0, 1)
            return Rollouts(states=swap(states), observations=swap(obs),
                            actions=swap(actions), rewards=swap(rewards))

        return collect(key)

    def get_rollouts(self, key: jax.Array, num_rollouts: int,
                     num_steps: int, policy: Optional[Callable] = None,
                     goal_state=None, initial_states=None,
                     policy_init=None) -> Rollouts:
        """N rollouts in lockstep: vmap over the env axis, one XLA program.

        This is the TPU-native replacement of get_rollouts_parallel
        (parallel.py:20-52): instead of one process per rollout, all N env
        instances step together; per-env PRNG streams come from splitting
        `key`.
        """
        fn = self.rollout_fn(num_steps, policy, policy_init=policy_init)
        keys = jax.random.split(key, num_rollouts)

        if initial_states is None and goal_state is None:
            rolls = jax.vmap(lambda k: fn(k))(keys)
        elif initial_states is None:
            rolls = jax.vmap(lambda k: fn(k, goal_state))(keys)
        else:
            rolls = jax.vmap(lambda k, s0: fn(k, goal_state, s0))(
                keys, initial_states)
        # squeeze the inner singleton batch axis from rollout_fn
        return jax.tree_util.tree_map(
            lambda x: x.reshape((num_rollouts,) + x.shape[2:]), rolls)


class PointMass(EnvWrapper):
    """env_wrappers.py:162-199."""
    state_dim = 4
    observation_dim = 4

    def get_goal_weights(self) -> jnp.ndarray:
        w = jnp.zeros(self.state_dim)
        w = w.at[0:2].set(10 * self._state_penalty)
        w = w.at[2:].set(self._state_penalty / 4.0)  # velocity damping
        return w

    def set_goal(self, key: jax.Array) -> jnp.ndarray:
        target = jax.random.uniform(key, (2,), minval=-0.25, maxval=0.25)
        return jnp.concatenate([target, jnp.zeros(2)])

    def apply_goal(self, env_state, goal_state):
        """point_mass params carry the target xy (see suite.point_mass)."""
        if isinstance(env_state.params, tuple):   # 'hard': (target, tendon)
            params = (goal_state[:2], env_state.params[1])
        else:
            params = goal_state[:2]
        return env_state.replace(params=params)

    def sample_state(self, key: jax.Array) -> jnp.ndarray:
        k1, k2 = jax.random.split(key)
        pos = jax.random.uniform(k1, (2,), minval=-0.29, maxval=0.29)
        vel = jax.random.uniform(k2, (2,), minval=-1.0, maxval=1.0)
        return jnp.concatenate([pos, vel])


class Reacher(EnvWrapper):
    """env_wrappers.py:201-249."""
    state_dim = 4
    observation_dim = 6
    override_control_timestep = 0.04

    def sample_state(self, key: jax.Array) -> jnp.ndarray:
        ks = jax.random.split(key, 4)
        return jnp.stack([
            jax.random.uniform(ks[0], (), minval=-np.pi, maxval=np.pi),
            jax.random.uniform(ks[1], (), minval=-2.8, maxval=2.8),
            jax.random.uniform(ks[2], (), minval=-3.0, maxval=3.0),
            jax.random.uniform(ks[3], (), minval=-3.0, maxval=3.0),
        ])

    def get_goal_weights(self) -> jnp.ndarray:
        w = jnp.zeros(self.observation_dim)
        w = w.at[0:2].set(self._state_penalty)
        w = w.at[2:4].set(self._state_penalty)       # vector-to-goal
        w = w.at[4:].set(self._state_penalty / 20)   # velocity damping
        return w

    def set_goal_state(self, key: jax.Array) -> jnp.ndarray:
        k1, k2 = jax.random.split(key)
        return jnp.stack([
            jax.random.uniform(k1, (), minval=-np.pi, maxval=np.pi),
            jax.random.uniform(k2, (), minval=-2.8, maxval=2.8),
            jnp.zeros(()), jnp.zeros(())])

    def set_goal(self, key: jax.Array) -> jnp.ndarray:
        g = jnp.zeros(self.observation_dim)
        s = self.set_goal_state(key)
        return g.at[0:2].set(s[0:2])

    @staticmethod
    def goal_xy(goal_state: jnp.ndarray) -> jnp.ndarray:
        """Forward kinematics of the two-link arm at the goal angles
        (env_wrappers.py get_xy)."""
        a = 0.12 * jnp.cos(goal_state[1])
        b = 0.12 * jnp.sin(goal_state[1])
        theta = goal_state[0] + jnp.arctan2(b, 0.12 + a)
        mag = jnp.sqrt((0.12 + a) ** 2 + b ** 2)
        return jnp.stack([mag * jnp.cos(theta), mag * jnp.sin(theta)])

    def apply_goal(self, env_state, goal_state):
        """Reacher's env params are the target xy; aim it at the arm pose
        described by the goal joint angles (env_wrappers.py set_target)."""
        return env_state.replace(params=self.goal_xy(goal_state))

    def sample_rollouts_biased_rewards(self, key: jax.Array,
                                       num_rollouts: int = 20,
                                       num_steps: int = 100) -> Rollouts:
        """Teleport the arm onto the target so rollouts see reward
        (env_wrappers.py:238-249), fully batched."""
        kg, kr = jax.random.split(key)
        goal_keys = jax.random.split(kg, num_rollouts)
        goals = jax.vmap(self.set_goal_state)(goal_keys)
        fn = self.rollout_fn(num_steps)
        keys = jax.random.split(kr, num_rollouts)
        rolls = jax.vmap(lambda k, g: fn(k, g, g))(keys, goals)
        return jax.tree_util.tree_map(
            lambda x: x.reshape((num_rollouts,) + x.shape[2:]), rolls)


class Cartpole(EnvWrapper):
    """Convenience wrapper (no reference analogue; generic flat state)."""
    state_dim = None  # nq + nv

    def sample_state(self, key: jax.Array) -> jnp.ndarray:
        k1, k2 = jax.random.split(key)
        nq = self._env.model.nq
        nv = self._env.model.nv
        qpos = jax.random.uniform(k1, (nq,), minval=-.5, maxval=.5)
        qvel = jax.random.uniform(k2, (nv,), minval=-1, maxval=1)
        return jnp.concatenate([qpos, qvel])

    def set_goal(self, key: jax.Array) -> jnp.ndarray:
        # upright pole at center: [x, cos, sin..] target on observations
        g = jnp.zeros(self.observation_dim)
        return g.at[1].set(1.0)

    def get_goal_weights(self) -> jnp.ndarray:
        w = jnp.zeros(self.observation_dim)
        w = w.at[0].set(self._state_penalty / 2)
        w = w.at[1:3].set(self._state_penalty)
        w = w.at[3:].set(self._state_penalty / 20)
        return w


class Pendulum(EnvWrapper):
    state_dim = None

    def set_goal(self, key: jax.Array) -> jnp.ndarray:
        g = jnp.zeros(self.observation_dim)
        return g.at[0].set(1.0)   # zz = 1: upright

    def get_goal_weights(self) -> jnp.ndarray:
        w = jnp.zeros(self.observation_dim)
        w = w.at[0:2].set(self._state_penalty)
        w = w.at[2:].set(self._state_penalty / 20)
        return w


class Cheetah(EnvWrapper):
    """env_wrappers.py:252-308: drop x, append speed + torso height."""
    state_dim = 18 - 1 + 2
    observation_dim = 17

    def get_state(self, env_state, data=None):
        from ..suite import sensors
        m = self._env.model
        phys = env_state.physics
        base = jnp.concatenate([phys.qpos[1:], phys.qvel])
        if data is None:
            return jnp.concatenate([base, jnp.zeros(2)])
        torso = m.name2id('body', 'torso')
        speed = sensors.subtree_linvel(m, data, torso)[0]
        height = sensors.subtree_com(m, data, torso)[2]
        return jnp.concatenate([base, speed[None], height[None]])

    def sample_state(self, key):
        ks = jax.random.split(key, 10)
        st = jnp.zeros(18)
        st = st.at[1].set(jax.random.uniform(ks[0], (), minval=-.2,
                                             maxval=.2))
        # torso angle distribution conditioned on height
        # (env_wrappers.py:258-266), approximated by the unconditional mix
        st = st.at[2].set(jax.random.uniform(ks[1], (), minval=-3.14,
                                             maxval=3.14))
        ranges = [(-0.5236, 1.0472), (-0.8727, 0.8727), (-4.0143, 0.8727),
                  (-0.9948, 0.0070), (-1.2217, 0.8727), (-0.4887, 0.4887)]
        for i, (lo, hi) in enumerate(ranges):
            st = st.at[3 + i].set(jax.random.uniform(ks[2 + i], (),
                                                     minval=lo, maxval=hi))
        st = st.at[9:].set(jax.random.uniform(ks[8], (9,), minval=-3,
                                              maxval=3))
        return st

    def get_goal_weights(self):
        w = jnp.zeros(self.state_dim)
        w = w.at[17].set(self._state_penalty)
        w = w.at[18].set(self._state_penalty / 2.0)
        return w

    def set_goal(self, key):
        g = jnp.zeros(self.state_dim)
        g = g.at[-2].set(2.0)   # target speed
        g = g.at[-1].set(0.4)   # target torso height
        return g


class Walker(EnvWrapper):
    """env_wrappers.py:506-556: drop x, append upright/height/speed."""
    state_dim = 18 - 1 + 3
    observation_dim = 24

    def get_state(self, env_state, data=None):
        from ..suite import sensors
        m = self._env.model
        phys = env_state.physics
        base = jnp.concatenate([phys.qpos[1:], phys.qvel])
        if data is None:
            return jnp.concatenate([base, jnp.zeros(3)])
        torso = m.name2id('body', 'torso')
        upright = data.ximat[torso, 2, 2]
        height = data.xpos[torso, 2]
        speed = sensors.subtree_linvel(m, data, torso)[0]
        return jnp.concatenate([base, upright[None], height[None],
                                speed[None]])

    def sample_state(self, key):
        ks = jax.random.split(key, 6)
        st = jnp.zeros(18)
        st = st.at[2].set(jax.random.uniform(ks[0], (), minval=-.1,
                                             maxval=.1))
        hip = jax.random.uniform(ks[1], (), minval=-.15, maxval=.15)
        st = st.at[3].set(hip)
        st = st.at[4].set(jax.random.uniform(ks[2], (), minval=-.3,
                                             maxval=0.))
        st = st.at[5].set(jax.random.uniform(ks[3], (), minval=-.1,
                                             maxval=.1))
        st = st.at[6].set(-hip)
        st = st.at[7].set(jax.random.uniform(ks[4], (), minval=-.3,
                                             maxval=0.))
        st = st.at[8].set(jax.random.uniform(ks[5], (), minval=-.1,
                                             maxval=.1))
        return st

    def get_goal_weights(self):
        w = jnp.zeros(self.state_dim)
        return w.at[-3:].set(self._state_penalty)

    def set_goal(self, key):
        g = jnp.zeros(self.state_dim)
        g = g.at[-3].set(1.0)   # upright
        g = g.at[-2].set(1.3)   # height
        g = g.at[-1].set(3.0)   # speed
        return g


class Hopper(EnvWrapper):
    """env_wrappers.py:557-592: drop x, append touch/height/speed."""
    state_dim = 14 - 1 + 4
    observation_dim = 15

    def get_state(self, env_state, data=None):
        from ..suite import sensors
        m = self._env.model
        phys = env_state.physics
        base = jnp.concatenate([phys.qpos[1:], phys.qvel])
        if data is None:
            return jnp.concatenate([base, jnp.zeros(4)])
        foot_geom = m.name2id('geom', 'foot')
        toe = m.name2id('site', 'touch_toe')
        heel = m.name2id('site', 'touch_heel')
        touch = jnp.log1p(jnp.stack([
            sensors.touch(m, data, toe, foot_geom),
            sensors.touch(m, data, heel, foot_geom)]))
        torso = m.name2id('body', 'torso')
        foot = m.name2id('body', 'foot')
        height = data.xipos[torso, 2] - data.xipos[foot, 2]
        speed = sensors.subtree_linvel(m, data, torso)[0]
        return jnp.concatenate([base, touch, height[None], speed[None]])

    def sample_state(self, key):
        ks = jax.random.split(key, 6)
        st = jnp.zeros(14)
        st = st.at[1].set(-0.078789)
        for i, (lo, hi) in enumerate([(-.01, .01), (-.01, .01), (-.01, .01),
                                      (.1, .12), (-.01, .01)]):
            st = st.at[2 + i].set(jax.random.uniform(ks[i], (), minval=lo,
                                                     maxval=hi))
        st = st.at[7:].set(jax.random.uniform(ks[5], (7,), minval=-.01,
                                              maxval=.01))
        return st

    def get_goal_weights(self):
        w = jnp.zeros(self.state_dim)
        w = w.at[-2].set(self._state_penalty / 2.0)
        return w.at[-1].set(self._state_penalty)

    def set_goal(self, key):
        g = jnp.zeros(self.state_dim)
        g = g.at[-2].set(0.9)   # height
        return g.at[-1].set(1.0)  # speed


class Swimmer(EnvWrapper):
    """env_wrappers.py:470-504: append head orientation (xmat row)."""
    state_dim = None  # nq + nv + 2, set in __init__

    def __init__(self, env, env_name, task_name):
        self.state_dim = env.model.nq + env.model.nv + 2
        super().__init__(env, env_name, task_name)

    def get_state(self, env_state, data=None):
        m = self._env.model
        phys = env_state.physics
        base = jnp.concatenate([phys.qpos, phys.qvel])
        if data is None:
            return jnp.concatenate([base, jnp.zeros(2)])
        head = m.name2id('body', 'head')
        return jnp.concatenate([base, data.ximat[head, 0, :2]])

    def sample_state(self, key):
        st = jnp.zeros(self._env.model.nq + self._env.model.nv)
        return st.at[2].set(jax.random.uniform(key, (), minval=-3,
                                               maxval=3))

    def get_goal_weights(self):
        w = jnp.zeros(self.state_dim)
        w = w.at[0:1].set(10 * self._state_penalty)
        return w.at[5:-2].set(self._state_penalty)

    def set_goal(self, key):
        # aim at a random target position (the task's own target params
        # carry the actual geom location)
        target = jax.random.uniform(key, (2,), minval=-.5, maxval=.5)
        g = jnp.zeros(self.state_dim)
        return g.at[0:2].set(target)


class Humanoid(EnvWrapper):
    """env_wrappers.py:345-468: Tassa-style CoM/foot penalty features."""
    state_dim = 55 + 5
    observation_dim = 67

    def get_state(self, env_state, data=None):
        from ..suite import sensors
        m = self._env.model
        phys = env_state.physics
        base = jnp.concatenate([phys.qpos, phys.qvel])
        if data is None:
            return jnp.concatenate([base, jnp.zeros(5)])
        torso = m.name2id('body', 'torso')
        rfoot = data.xpos[m.name2id('body', 'right_foot')]
        lfoot = data.xpos[m.name2id('body', 'left_foot')]
        com = sensors.subtree_com(m, data, torso)
        ave_foot = (rfoot + lfoot) / 2.0
        above_feet = ave_foot + jnp.array([0.0, 0.0, 1.3])
        torso_pos = data.xpos[torso]
        p1 = jnp.linalg.norm(com[:2] - ave_foot[:2])     # Tassa term 1
        p2 = jnp.linalg.norm(com[:2] - torso_pos[:2])    # Tassa term 2
        p3 = jnp.linalg.norm(torso_pos[1:] - above_feet[1:])
        com_vel = sensors.subtree_linvel(m, data, torso)[:2]
        return jnp.concatenate([base, p1[None], p2[None], p3[None],
                                com_vel])

    def sample_action(self, key, batch_shape=()):
        """Gaussian torques with legs-only actuation
        (env_wrappers.py:424-435)."""
        a = 0.4 * jax.random.normal(
            key, tuple(batch_shape) + (self.action_dim,))
        return a.at[..., 3:-6].set(0.0)

    def sample_state(self, key):
        ks = jax.random.split(key, 21)
        st = jnp.zeros(55)
        st = st.at[2].set(1.3)
        ranges = [(-0.7854, 0.7854), (-1.3089, 0.5236), (-0.6109, 0.6109),
                  (-0.4363, 0.0873), (-1.0472, 0.6109), (-1.9199, 0.3491),
                  (-2.7925, 0.0349), (-0.8727, 0.8727), (-0.8727, 0.8727),
                  (-0.4363, 0.0873), (-1.0472, 0.6109), (-1.9199, 0.3491),
                  (-2.7925, 0.0349), (-0.8727, 0.8727), (-0.8727, 0.8727),
                  (-1.4835, 1.0472), (-1.4835, 1.0472), (-1.5708, 0.8727),
                  (-1.0472, 1.4835), (-1.0472, 1.4835), (-1.5708, 0.8727)]
        for i, (lo, hi) in enumerate(ranges):
            st = st.at[7 + i].set(jax.random.uniform(ks[i], (), minval=lo,
                                                     maxval=hi))
        return st

    def state_to_physics(self, state):
        nq = self._env.model.nq
        return state[:nq], state[nq:nq + self._env.model.nv]

    def get_goal_weights(self):
        w = jnp.zeros(self.state_dim)
        return w.at[-5:].set(10 * self._state_penalty)

    def set_goal(self, key):
        return jnp.zeros(self.state_dim)


class Manipulator(EnvWrapper):
    """env_wrappers.py:310-343: grasp-site position + touch features."""
    state_dim = 22 + 7
    observation_dim = 37

    def get_state(self, env_state, data=None):
        from ..suite import sensors
        m = self._env.model
        phys = env_state.physics
        base = jnp.concatenate([phys.qpos, phys.qvel])
        if data is None:
            return jnp.concatenate([base, jnp.zeros(7)])
        grasp = m.name2id('site', 'grasp')
        gx = data.site_xpos[grasp, 0]
        gz = data.site_xpos[grasp, 2]
        task = self._env.task
        touch = task._touch(m, data)
        return jnp.concatenate([base, gx[None], gz[None], touch])

    def get_goal_weights(self):
        w = jnp.zeros(self.state_dim)
        w = w.at[8:10].set(10 * self._state_penalty)
        w = w.at[10:21].set(self._state_penalty / 4)
        w = w.at[-7:-5].set(10 * self._state_penalty)
        return w.at[-5:].set(self._state_penalty / 20)

    def set_goal(self, key):
        # ball over the randomized target; params carry the actual target
        g = jnp.zeros(self.state_dim)
        target = jax.random.uniform(key, (2,), minval=-.4, maxval=.4)
        g = g.at[8].set(target[0])
        g = g.at[9].set(target[1])
        g = g.at[-7].set(target[0])
        g = g.at[-6].set(target[1])
        return g.at[-5:].set(0.5)


_WRAPPERS = {
    'Pointmass': PointMass,
    'PointMass': PointMass,
    'Reacher': Reacher,
    'Cartpole': Cartpole,
    'Pendulum': Pendulum,
    'Cheetah': Cheetah,
    'Walker': Walker,
    'Hopper': Hopper,
    'Swimmer': Swimmer,
    'Humanoid': Humanoid,
    'Manipulator': Manipulator,
}


def load(env_name: str, task_name: str, **kwargs) -> EnvWrapper:
    return EnvWrapper.load(env_name, task_name, **kwargs)
