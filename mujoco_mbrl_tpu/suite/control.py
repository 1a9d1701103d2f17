"""RL environment core: dm_env TimeStep protocol as pure JAX functions.

Functional re-design of the reference env loop
(``dm_control/dm_control/rl/control.py:35-197``):

* ``Environment.reset(key)`` and ``Environment.step(state, action)`` are
  pure, so ``vmap`` turns one env into an env *batch* and ``jit`` fuses the
  whole rollout; this replaces the reference's process-pool parallel
  collection (``src/mbrl/parallel.py``) with lockstep SPMD stepping.
* Auto-reset on the step after LAST (rl/control.py:101-130) is replicated
  with `where`-masking in :meth:`Environment.autoreset_step`, since lockstep
  vmap cannot early-exit.
* ``control_timestep = physics_timestep * n_sub_steps`` bookkeeping follows
  rl/control.py:166-197.
"""

from __future__ import annotations

import collections
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..physics import engine
from ..physics import model as M

FIRST, MID, LAST = 0, 1, 2


@struct.dataclass
class TimeStep:
    step_type: jnp.ndarray   # int32: FIRST/MID/LAST
    reward: jnp.ndarray      # float
    discount: jnp.ndarray    # float
    observation: Dict[str, jnp.ndarray]

    def first(self):
        return self.step_type == FIRST

    def last(self):
        return self.step_type == LAST


@struct.dataclass
class EnvState:
    """Carried env state: physics + per-episode task params + bookkeeping."""
    physics: M.State
    params: Any              # task-specific pytree ((), or model overrides)
    step_count: jnp.ndarray  # int32 control steps taken this episode
    # bool: the previous step() returned LAST (time limit OR early
    # termination). autoreset_step consults this so tasks that terminate
    # early (lqr, locomotion) reset on the following step, matching
    # rl/control.py:101-106 which resets after LAST regardless of cause.
    last: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.zeros((), jnp.bool_))


class ArraySpec:
    def __init__(self, shape, dtype, name=''):
        self.shape = tuple(shape)
        self.dtype = np.dtype(dtype)
        self.name = name

    def __repr__(self):
        return f'ArraySpec(shape={self.shape}, dtype={self.dtype}, name={self.name!r})'


class BoundedArraySpec(ArraySpec):
    def __init__(self, shape, dtype, minimum, maximum, name=''):
        super().__init__(shape, dtype, name)
        self.minimum = np.broadcast_to(np.asarray(minimum), shape)
        self.maximum = np.broadcast_to(np.asarray(maximum), shape)

    def __repr__(self):
        return (f'BoundedArraySpec(shape={self.shape}, dtype={self.dtype}, '
                f'min={self.minimum}, max={self.maximum})')


def action_spec(model: M.Model) -> BoundedArraySpec:
    """Action spec from actuator ctrlrange (engine.py:866-876 semantics)."""
    lo = np.full(model.nu, -np.inf)
    hi = np.full(model.nu, np.inf)
    cr = np.asarray(model.actuator_ctrlrange)
    for u in range(model.nu):
        if model.actuator_ctrllimited[u]:
            lo[u], hi[u] = cr[u, 0], cr[u, 1]
    return BoundedArraySpec((model.nu,), np.float32, lo, hi, 'action')


def flatten_observation(obs: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Concatenate an observation dict into one vector (rl/control.py:377-402)."""
    parts = []
    for k in obs:
        v = obs[k]
        parts.append(jnp.atleast_1d(v).reshape(-1))
    return jnp.concatenate(parts)


class Environment:
    """A task bound to a compiled model; all methods are pure functions.

    Unlike the reference's stateful ``control.Environment`` the instance
    holds only static configuration — episode state lives in
    :class:`EnvState`, so instances are free to cross jit/vmap boundaries.
    """

    def __init__(self, model: M.Model, task, time_limit: float = float('inf'),
                 control_timestep: Optional[float] = None,
                 contact_fn=None, max_reset_attempts: int = 1):
        self._model = model
        self._task = task
        if control_timestep is None:
            control_timestep = float(model.opt.timestep)
        self._n_sub_steps = engine.n_substeps(model, control_timestep)
        self._control_timestep = control_timestep
        self._time_limit = time_limit
        if time_limit == float('inf'):
            self._max_steps = np.iinfo(np.int32).max
        else:
            self._max_steps = int(round(time_limit / control_timestep))
        self._contact_fn = contact_fn
        # pv-only observation fast path (see base.Task.OBSERVES_ACC)
        self._obs_acc = bool(getattr(task, 'OBSERVES_ACC', True))
        # Bad-init retry (composer/environment.py:308-318 analogue):
        # under lockstep vmap a failed episode init cannot raise, so
        # reset() draws up to N candidate inits (trace-time unroll) and
        # keeps the first whose physics state is finite. N=1 keeps the
        # single-attempt suite semantics with zero extra compute.
        if max_reset_attempts < 1:
            raise ValueError('max_reset_attempts must be >= 1')
        self._max_reset_attempts = int(max_reset_attempts)

    # -- static info -----------------------------------------------------
    @property
    def model(self) -> M.Model:
        return self._model

    @property
    def task(self):
        return self._task

    @property
    def max_steps(self) -> int:
        return self._max_steps

    def control_timestep(self) -> float:
        return self._control_timestep

    def action_spec(self) -> BoundedArraySpec:
        return action_spec(self._model)

    def observation_spec(self) -> Dict[str, ArraySpec]:
        state, ts = self.reset(jax.random.PRNGKey(0))
        return collections.OrderedDict(
            (k, ArraySpec(np.shape(v), np.asarray(v).dtype, k))
            for k, v in ts.observation.items())

    # -- dynamics ---------------------------------------------------------
    def _model_with(self, params) -> M.Model:
        """Apply per-episode task parameter overrides to the model."""
        if hasattr(self._task, 'apply_params'):
            return self._task.apply_params(self._model, params)
        return self._model

    def reset(self, key: jnp.ndarray) -> Tuple[EnvState, TimeStep]:
        """Start a new episode (task randomization via explicit PRNG key)."""
        phys, params = self._task.initialize_episode(self._model, key)
        for attempt in range(1, self._max_reset_attempts):
            # keep the incumbent init unless it produced a non-finite /
            # exploding state; otherwise fall through to a fresh draw
            retry_key = jax.random.fold_in(key, attempt)
            phys2, params2 = self._task.initialize_episode(
                self._model, retry_key)
            bad = engine.diverged(phys)
            phys = jax.tree_util.tree_map(
                lambda a, b: jnp.where(bad, b, a), phys, phys2)
            params = jax.tree_util.tree_map(
                lambda a, b: jnp.where(bad, b, a), params, params2)
        m = self._model_with(params)
        # settle kinematics (mirrors reset -> after_reset -> mj_forward)
        obs = self._observe(m, phys, params)
        state = EnvState(physics=phys, params=params,
                         step_count=jnp.zeros((), jnp.int32),
                         last=jnp.zeros((), jnp.bool_))
        zero = jnp.zeros((), phys.qpos.dtype)
        ts = TimeStep(step_type=jnp.full((), FIRST, jnp.int32),
                      reward=zero, discount=zero + 1.0, observation=obs)
        return state, ts

    def render(self, state: EnvState, height: int = 240, width: int = 320,
               camera_id=0, depth: bool = False,
               segmentation: bool = False):
        """Render the current state (Physics.render, engine.py:152-184).

        Uses the analytic ray caster over the model's MJCF cameras;
        returns RGB float [0,1] (H, W, 3), metric depth (H, W), or geom
        ids (H, W)."""
        from ..physics import engine as _eng
        from ..utils.raycast import Camera
        m = self._model_with(state.params)
        cam = Camera(m, height=height, width=width, camera_id=camera_id)
        zero_ctrl = jnp.zeros((m.nu,), state.physics.qpos.dtype)
        need_reward = bool(getattr(self._task, 'visualize_reward', False)
                           and not depth and not segmentation)
        data = _eng.forward(m, state.physics, zero_ctrl, self._contact_fn,
                            acc_stage=need_reward and self._obs_acc)
        reward = None
        if need_reward:
            # reward-keyed geom tint (reference base.py:85-87 after_step)
            with jax.default_matmul_precision('highest'):
                reward = self._task.get_reward(m, state.physics, data,
                                               zero_ctrl)
        return cam.render(data, depth=depth, segmentation=segmentation,
                          reward=reward)

    def _observe(self, m, phys, params):
        data = engine.forward(m, phys, jnp.zeros((m.nu,), phys.qpos.dtype),
                              self._contact_fn)
        # Observation extraction (egocentric frames, sensor rotations)
        # is tiny matmuls outside the engine's precision pins; on TPU
        # the bf16 default would cost ~1e-3 obs error (quadruped
        # egocentric_state vs the 1e-4 task-parity band) for no
        # measurable speed. Pin it like the engine does.
        with jax.default_matmul_precision('highest'):
            return self._task.get_observation(m, phys, data)

    def step(self, state: EnvState, action: jnp.ndarray) -> Tuple[EnvState, TimeStep]:
        """One control step: task.before_step -> N physics substeps -> reward."""
        new_state, ts, _ = self.step_with_data(state, action)
        return new_state, ts

    def step_with_data(self, state: EnvState, action: jnp.ndarray
                       ) -> Tuple[EnvState, TimeStep, 'engine.M.Data']:
        """`step` that also returns the post-step forward Data.

        Collection paths that derive extra quantities from the stepped
        configuration (the mbrl wrappers' featured state: torso height,
        subtree speed, touch) reuse this Data instead of paying a SECOND
        full forward per control step (the redundant `_observe_full`
        pass was ~28% of the agent-loop's step cost at 1024 envs)."""
        m = self._model_with(state.params)
        ctrl = self._task.before_step(action, m) if hasattr(
            self._task, 'before_step') else action
        phys = engine.substep(m, state.physics, ctrl, self._n_sub_steps,
                              self._contact_fn)
        data = engine.forward(m, phys, ctrl, self._contact_fn,
                              acc_stage=self._obs_acc)
        with jax.default_matmul_precision('highest'):
            # same precision pin as _observe: task-layer obs/reward math
            obs = self._task.get_observation(m, phys, data)
            reward = self._task.get_reward(m, phys, data, ctrl)
        step_count = state.step_count + 1
        is_last = step_count >= self._max_steps
        discount = jnp.ones((), phys.qpos.dtype)
        # early termination (rl/control.py:115-121 get_termination protocol)
        if hasattr(self._task, 'get_termination'):
            terminated, term_discount = self._task.get_termination(
                m, phys, data)
            is_last = jnp.logical_or(is_last, terminated)
            discount = jnp.where(terminated, term_discount, discount)
        step_type = jnp.where(is_last, LAST, MID).astype(jnp.int32)
        new_state = EnvState(physics=phys, params=state.params,
                             step_count=step_count, last=is_last)
        return new_state, TimeStep(
            step_type=step_type,
            reward=jnp.asarray(reward, phys.qpos.dtype),
            discount=discount, observation=obs), data

    def autoreset_step(self, state: EnvState, action: jnp.ndarray,
                       key: jnp.ndarray) -> Tuple[EnvState, TimeStep]:
        """step() that restarts the episode after LAST (lockstep-vmap safe).

        Replicates rl/control.py:101-106: the step *after* a LAST timestep
        resets and returns FIRST. Both branches are evaluated; `where`
        masks select — the standard SPMD trade.
        """
        stepped_state, stepped_ts = self.step(state, action)
        reset_state, reset_ts = self.reset(key)
        # restart on episode end (time limit OR early termination, carried
        # as state.last) OR physics divergence (the SPMD analogue of
        # PhysicsError + reset_context tolerance, rl/control.py:250-253)
        was_last = jnp.logical_or(state.last,
                                  engine.diverged(state.physics))

        def pick(a, b):
            return jax.tree_util.tree_map(
                lambda x, y: jnp.where(
                    jnp.reshape(was_last, (1,) * np.ndim(x)) if np.ndim(x)
                    else was_last, x, y), a, b)

        return pick(reset_state, stepped_state), pick(reset_ts, stepped_ts)
