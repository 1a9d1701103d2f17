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
        if not hasattr(type(self), 'state_dim') or \
                getattr(type(self), 'state_dim', None) is None:
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
    def get_state(self, env_state: EnvState) -> jnp.ndarray:
        """Flat physics state [qpos, qvel] (env_wrappers.py:36-39)."""
        return jnp.concatenate([env_state.physics.qpos,
                                env_state.physics.qvel])

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
            if goal_state is not None or initial_state is not None:
                obs0 = env._observe(env._model_with(env_state.params),
                                    env_state.physics, env_state.params)
            else:
                obs0 = ts.observation

            s0 = self.get_state(env_state)
            o0 = flatten_observation(obs0)
            carry0 = policy_init() if policy_init is not None else 0

            def step_fn(carry, inp):
                env_state, pcarry = carry
                t, kt = inp
                state_vec = self.get_state(env_state)
                obs_vec = flatten_observation(
                    env._observe(env._model_with(env_state.params),
                                 env_state.physics, env_state.params))
                action, pcarry = pol(kt, t, state_vec, obs_vec, pcarry)
                env_state, ts = env.step(env_state, action)
                out = (self.get_state(env_state),
                       flatten_observation(ts.observation),
                       action, ts.reward)
                return (env_state, pcarry), out

            keys = jax.random.split(kroll, num_steps)
            (_, _), (states, obs, actions, rewards) = jax.lax.scan(
                step_fn, (env_state, carry0),
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


_WRAPPERS = {
    'Pointmass': PointMass,
    'PointMass': PointMass,
    'Reacher': Reacher,
    'Cartpole': Cartpole,
    'Pendulum': Pendulum,
}


def load(env_name: str, task_name: str, **kwargs) -> EnvWrapper:
    return EnvWrapper.load(env_name, task_name, **kwargs)
