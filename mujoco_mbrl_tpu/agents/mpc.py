"""MPC agents: receding-horizon control + the collect->fit->plan loop.

Reference contract: ``src/mbrl/agents.py``.

* :class:`MPCPolicy` — replan every step with a one-step warm start
  (agents.py:29-56). The policy is a pure function with an explicit
  `(valid, last_trajectory)` carry so whole MPC rollouts jit into a single
  XLA program: `lax.scan` over env steps, planner (vmap over candidates x
  scan over horizon) inside.
* :class:`MPCAgent` — outer-loop scaffolding: rollout collection into the
  device replay buffer, metric recording, checkpointing
  (agents.py:58-180). Collection is lockstep-vmapped instead of the
  reference's NUM_WORKERS process pool.
* :class:`GoalStateAgent` — plans against hand-built goal costs
  (smooth-abs state + cosh action, agents.py:182-298); goal resampled
  every iteration; models trained on z-normalized flat observations
  (obs_only data mode).
* :class:`RewardAgent` — plans against the model's learned reward head
  (agents.py:300-379). NOTE: the reference passes the *raw* predicted
  reward as the cost to argmin (agents.py:342-366), i.e. it minimizes
  predicted reward; here the cost is the negated predicted reward, which
  is the evidently intended behavior.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import data as D
from .. import models as Mo
from .. import planners as P
from ..envs import EnvWrapper
from ..utils import MetricsWriter, logger, save_pytree, load_pytree


class MPCPolicy:
    """Warm-started receding-horizon policy as a scan-carry pure function.

    `policy(key, t, state_vec, obs_vec, carry) -> (action, carry)` — the
    protocol expected by EnvWrapper.rollout_fn. Carry holds the previous
    plan; at t == 0 it is invalidated (agents.py:39-40).
    """

    def __init__(self, model: Callable, cost: Callable, planner,
                 sample_action: Callable, horizon: int, action_dim: int,
                 obs_dim: int, planner_kwargs: Optional[dict] = None,
                 plan_on_observations: bool = True):
        self.model = model
        self.cost = cost
        self.planner = planner
        self.sample_action = sample_action
        self.horizon = horizon
        self.action_dim = action_dim
        self.obs_dim = obs_dim
        self.planner_kwargs = planner_kwargs or {}
        # Planning space: flat observations (reference obs_only mode) or
        # the wrapper's feature-engineered state (whose dims the per-domain
        # goals/weights live in — the reference left this inconsistent,
        # env_wrappers.py:8 TODO; locomotion domains need state space).
        self.plan_on_observations = plan_on_observations

    def init_carry(self):
        H = self.horizon
        return (jnp.zeros((), jnp.bool_),
                P.Trajectory(states=jnp.zeros((H + 1, self.obs_dim)),
                             actions=jnp.zeros((H, self.action_dim))))

    def __call__(self, key, t, state_vec, obs_vec, carry):
        if not self.plan_on_observations:
            obs_vec = state_vec
        valid, last = carry
        valid = jnp.logical_and(valid, t != 0)
        kf, kp = jax.random.split(key)
        # Warm start: previous plan's actions, else planner-appropriate
        # fallback (random for shooting/GD, zeros for CEM mean).
        if self.planner is P.CEMPlanner:
            fallback = jnp.zeros_like(last.actions)
        else:
            fallback = self.sample_action(kf, (self.horizon,))
        warm_actions = jnp.where(valid, last.actions, fallback)
        init_traj = P.Trajectory(states=last.states, actions=warm_actions)

        traj = self.planner.plan(
            obs_vec, self.model, self.cost, self.sample_action,
            self.horizon, initial_trajectory=init_traj, key=kp,
            **self.planner_kwargs)
        return traj.actions[0], (jnp.ones((), jnp.bool_), traj)


class BatchedMPCPolicy:
    """Whole-env-batch MPC policy over planners.cem_batched.

    Protocol for EnvWrapper.get_rollouts_batched:
    `policy(key, t, state_mat (B, sd), obs_mat (B, od), carry) ->
    (actions (B, ad), carry)`. One planner call per control step plans for
    every env, so the candidate rollouts fold into a single (B*K)-row
    problem — the shape the fused Pallas kernel (ops.mlp_rollout_costs_t)
    grids over. Warm start mirrors MPCPolicy: the previous plan's actions
    seed the CEM mean, invalidated at t == 0 (agents.py:39-47).
    """

    def __init__(self, model: Callable, cost: Callable, horizon: int,
                 action_dim: int, num_envs: int,
                 planner_kwargs: Optional[dict] = None,
                 rollout_costs_fn: Optional[Callable] = None,
                 sample_costs_builder: Optional[Callable] = None,
                 plan_on_observations: bool = True):
        self.model = model
        self.cost = cost
        self.horizon = horizon
        self.action_dim = action_dim
        self.num_envs = num_envs
        cfg = {**P.CEMPlanner.defaults, **(planner_kwargs or {})}
        cfg.pop('action_dim', None)
        self.cfg = cfg
        self.rollout_costs_fn = rollout_costs_fn
        # builder(obs_mat) -> sample_costs_fn: binds the per-step initial
        # states into the fully-fused sampling kernel (TPU only)
        self.sample_costs_builder = sample_costs_builder
        self.plan_on_observations = plan_on_observations

    def init_carry(self):
        return (jnp.zeros((), jnp.bool_),
                jnp.zeros((self.horizon, self.num_envs, self.action_dim)))

    def __call__(self, key, t, state_mat, obs_mat, carry):
        if not self.plan_on_observations:
            obs_mat = state_mat
        valid, last_actions = carry
        valid = jnp.logical_and(valid, t != 0)
        init_mean = jnp.where(valid, last_actions,
                              jnp.zeros_like(last_actions))
        scf = (self.sample_costs_builder(obs_mat)
               if self.sample_costs_builder is not None else None)
        traj = P.cem_batched(
            key, obs_mat, self.model, self.cost, self.horizon,
            self.action_dim,
            num_candidates=self.cfg['num_candidates'],
            num_elites=self.cfg['num_elites'],
            num_iterations=self.cfg['num_iterations'],
            init_mean=init_mean.transpose(1, 0, 2),
            action_low=self.cfg['action_low'],
            action_high=self.cfg['action_high'],
            rollout_costs_fn=None if scf is not None
            else self.rollout_costs_fn,
            sample_costs_fn=scf,
            return_states=False)
        return traj.actions[0], (jnp.ones((), jnp.bool_), traj.actions)


def save(agent: 'MPCAgent', path: str) -> None:
    """Checkpoint the agent's training state (supersedes whole-object
    pickling, agents.py:22-27)."""
    save_pytree(path, agent.checkpoint_state())


def load(agent: 'MPCAgent', path: str) -> None:
    """Restore state saved by `save` into an identically-configured agent."""
    state = load_pytree(path, agent.checkpoint_state())
    agent.restore_state(state)


class MPCAgent:
    """Outer-loop scaffolding (agents.py:58-180)."""

    def __init__(self, environment: EnvWrapper, planner, model, horizon: int,
                 optimizer: optax.GradientTransformation,
                 rollout_length: int, num_rollouts_per_iteration: int,
                 num_train_iterations: int,
                 writer: Optional[MetricsWriter], base_path: str,
                 dataset: Optional[D.ReplayBuffer] = None,
                 planner_kwargs: Optional[dict] = None,
                 train_epochs: int = 50, train_batch_size: int = 512,
                 num_initial_rollouts: int = 20,
                 seed: int = 0,
                 kernel_kwargs: Optional[dict] = None):
        self.environment = environment
        self.planner = planner
        self.model = model
        self.horizon = horizon
        self.optimizer = optimizer
        self.rollout_length = rollout_length
        self.num_rollouts_per_iteration = num_rollouts_per_iteration
        self.num_train_iterations = num_train_iterations
        self.writer = writer
        self.base_path = base_path
        self.planner_kwargs = planner_kwargs or {}
        # Extra static options for the fused sampling kernel (TPU path):
        # e.g. {'sampler': 'triangular'} or {'compute_dtype': jnp.bfloat16}
        self.kernel_kwargs = kernel_kwargs or {}
        self.train_epochs = train_epochs
        self.train_batch_size = train_batch_size
        self.num_initial_rollouts = num_initial_rollouts

        self.key = jax.random.PRNGKey(seed)
        self.params = model.init(self._next_key())
        self.opt_state = optimizer.init(self.params)
        self.train_iterations = 0
        # Model/planning data stream: observations (reference obs_only
        # mode, agents.py:218) or the wrapper's featured states. Subclasses
        # may flip this (GoalStateAgent matches the goal's space).
        self.obs_only = True

        if dataset is None:
            # reference default: 10k transitions capacity (agents.py:81)
            cap_rollouts = max(10000 // rollout_length, 1)
            dataset = D.init_replay(
                cap_rollouts, rollout_length,
                state_dim=environment.state_dim,
                obs_dim=environment.observation_dim,
                act_dim=environment.action_dim)
        self.dataset = dataset

        self._jit_random_collect = jax.jit(
            lambda key, goal: self.environment.get_rollouts(
                key, self.num_rollouts_per_iteration, self.rollout_length,
                policy=None, goal_state=goal))
        self._jit_seed_collect = jax.jit(
            lambda key, goal: self.environment.get_rollouts(
                key, self.num_initial_rollouts, self.rollout_length,
                policy=None, goal_state=goal))

    # ------------------------------------------------------------------
    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def checkpoint_state(self):
        return {'params': self.params, 'opt_state': self.opt_state,
                'dataset': self.dataset, 'key': self.key,
                'iter': jnp.asarray(self.train_iterations)}

    def restore_state(self, state):
        self.params = state['params']
        self.opt_state = state['opt_state']
        self.dataset = state['dataset']
        self.key = state['key']
        self.train_iterations = int(state['iter'])

    # ------------------------------------------------------------------
    def add_rollouts(self, policy_collect=None, num_rollouts=None,
                     goal_state=None):
        """Collect rollouts (lockstep batch) and append to the replay."""
        rollout_type = 'policy' if policy_collect is not None else 'random'
        n = num_rollouts or self.num_rollouts_per_iteration
        logger.info('Generating %d %s rollouts of %d length.',
                    n, rollout_type, self.rollout_length)
        key = self._next_key()
        if policy_collect is not None:
            rolls = policy_collect(key, goal_state)
        elif n == self.num_initial_rollouts:
            rolls = self._jit_seed_collect(key, goal_state)
        else:
            rolls = self._jit_random_collect(key, goal_state)
        self.dataset = D.add_rollouts(self.dataset, rolls)
        self._record_metrics(rolls, rollout_type)
        return rolls

    def _record_metrics(self, rolls: D.Rollouts, rollout_type: str):
        if self.writer is None:
            return
        sums = np.asarray(rolls.sum_of_rewards())
        self.writer.add_scalar(f'AvgRolloutRewards/{rollout_type}',
                               sums.mean(), self.train_iterations)
        self.writer.add_histogram(f'RolloutRewards/{rollout_type}',
                                  sums, self.train_iterations)

    def _normalizers(self):
        return Mo.train.make_normalizers(self.dataset,
                                         use_observations=self.obs_only)

    def fit_model(self):
        """One model-fitting phase on the current replay buffer."""
        norms = self._normalizers()
        self.params, self.opt_state, log = jax.jit(
            lambda p, o, buf, k: Mo.train_model(
                self.model, p, buf, k, optimizer=self.optimizer,
                opt_state=o, batch_size=self.train_batch_size,
                num_epochs=self.train_epochs, normalizers=norms,
                obs_only=self.obs_only))(
            self.params, self.opt_state, self.dataset, self._next_key())
        if self.writer is not None:
            losses = np.asarray(log.losses)
            for i in range(0, len(losses), max(len(losses) // 50, 1)):
                self.writer.add_scalar(
                    f'loss/state/{self.train_iterations}',
                    losses[i], i)
        return log

    def train(self):
        raise NotImplementedError

    def get_action(self, key, obs_vec):
        raise NotImplementedError


class GoalStateAgent(MPCAgent):
    """Cost = smooth-abs(obs - goal) + cosh(action) (agents.py:182-298)."""

    def __init__(self, *, action_cost=None, state_cost_weights=None,
                 **kwargs):
        super().__init__(**kwargs)
        env = self.environment
        self.state_cost_weights = (
            state_cost_weights if state_cost_weights is not None
            else env.get_goal_weights())
        self.action_cost_alpha = getattr(action_cost, 'alpha', 0.25)
        self.training_goal_state = None

        # Plan in the space the goal lives in: the per-domain goals/weights
        # (env_wrappers.py set_goal/get_goal_weights) are defined over the
        # featured STATE vector on locomotion domains, over observations on
        # point_mass/reacher. (The reference left the mismatch as a TODO at
        # env_wrappers.py:8 and only exercised matching-dim domains.)
        goal_dim = int(self.state_cost_weights.shape[0])
        if goal_dim == env.observation_dim:
            self.obs_only = True
        elif goal_dim == env.state_dim:
            self.obs_only = False
        else:
            raise ValueError(
                f'goal weights dim {goal_dim} matches neither '
                f'observation_dim {env.observation_dim} nor state_dim '
                f'{env.state_dim} of {type(env).__name__}')
        self.plan_dim = goal_dim

        # One jitted collector: (params, stats-normalizers, goal, key).
        self._jit_policy_collect_n = {}

    # -- policy construction (pure, closed over nothing traced) ---------
    def _plan_model_fn(self, params, norms):
        """Model fn the planner rolls candidates through. Ensembles use
        TS-infinity member propagation (candidate k -> member k % n)
        instead of the mean — BASELINE.md's walker-walk ensemble config."""
        if isinstance(self.model, Mo.EnsembleDynamics):
            return lambda s, a: self.model.forward_ts(params, s, a, norms)
        return lambda s, a: self.model.forward(params, s, a, norms)

    def _make_policy(self, params, norms, goal_state):
        env = self.environment
        model_fn = self._plan_model_fn(params, norms)

        def cost(states, actions):
            sc = Mo.smooth_abs_loss(states, goal_state,
                                    self.state_cost_weights)
            ac = Mo.cosh_loss(actions, self.action_cost_alpha)
            return sc + ac

        return MPCPolicy(
            model=model_fn, cost=cost, planner=self.planner,
            sample_action=env.sample_action, horizon=self.horizon,
            action_dim=env.action_dim, obs_dim=self.plan_dim,
            planner_kwargs=self.planner_kwargs,
            plan_on_observations=self.obs_only)

    def _make_batched_policy(self, params, norms, goal_state, n):
        """Batched-CEM policy; fuses the rollout-cost kernel when the
        model family and cost match the kernel's contract (plain
        MLPDynamics + smooth-abs/cosh — the GoalStateAgent default)."""
        from .. import ops
        env = self.environment
        model_fn = self._plan_model_fn(params, norms)

        def cost(states, actions):
            return (Mo.smooth_abs_loss(states, goal_state,
                                       self.state_cost_weights)
                    + Mo.cosh_loss(actions, self.action_cost_alpha))

        rc = None
        if type(self.model) is Mo.MLPDynamics and self.model.noise is None:
            rc = lambda s0T, aT: ops.mlp_rollout_costs_t(
                params, s0T, aT, goal_state, self.state_cost_weights,
                normalizers=norms, alpha_action=self.action_cost_alpha)
        build = self._sample_costs_builder(params, norms)
        scb = ((lambda obs: build(obs, goal_state))
               if build is not None else None)
        return BatchedMPCPolicy(
            model=model_fn, cost=cost, horizon=self.horizon,
            action_dim=env.action_dim, num_envs=n,
            planner_kwargs=self.planner_kwargs, rollout_costs_fn=rc,
            sample_costs_builder=scb,
            plan_on_observations=self.obs_only)

    def _sample_costs_builder(self, params, norms):
        """On TPU, the fully-fused sampling kernel (in-kernel PRNG has no
        CPU lowering); returns a builder bound per planner call.

        Ensembles keep the fused path: one kernel call per member over a
        K/n candidate slice, results interleaved along K so candidate k
        belongs to member k % n — the same TS-infinity assignment
        `forward_ts` uses on the XLA path."""
        from .. import ops
        from ..ops.cem_rollout import _supports_pallas
        is_ens = (isinstance(self.model, Mo.EnsembleDynamics)
                  and type(self.model.base) is Mo.MLPDynamics)
        if not (_supports_pallas()
                and (is_ens or type(self.model) is Mo.MLPDynamics)
                and self.model.noise is None):
            return None
        K = {**P.CEMPlanner.defaults,
             **self.planner_kwargs}['num_candidates']

        if not is_ens:
            kkw = dict(self.kernel_kwargs)
            # Production defaults, overridable per agent: grouped lanes
            # (4 envs share each MLP matmul pass; measured +19% on the
            # walker north-star bench — the kernel falls back to G=1
            # when the env batch doesn't tile) and padded buffers
            # consumed in place by cem_batched's elite refit (no
            # full-HBM slice copy per iteration).
            kkw.setdefault('envs_per_program', 4)
            kkw.setdefault('return_padded', True)

            def build(obs_mat, goal_state):
                return lambda seed, mean, std: ops.mlp_sample_rollout_costs(
                    params, seed, obs_mat, mean, std, goal_state,
                    self.state_cost_weights, normalizers=norms,
                    alpha_action=self.action_cost_alpha,
                    num_candidates=K, **kkw)
            return build

        n = self.model.n
        if K % n:
            import warnings
            warnings.warn(
                f'num_candidates={K} is not divisible by the '
                f'{n}-member ensemble: the fused TS-∞ kernel is '
                'disabled and planning falls back to the (slower) XLA '
                'scan path. Pick num_candidates as a multiple of the '
                'ensemble size.', RuntimeWarning, stacklevel=2)
            return None

        kkw = dict(self.kernel_kwargs)
        kkw.pop('envs_per_program', None)   # single-MLP-kernel-only knob
        kkw.pop('return_padded', None)      # ensemble decode needs exact K

        def build(obs_mat, goal_state):
            # one launch, one program per env with all members' lanes
            # resident; member-blocked padded buffers go straight to
            # cem_batched's in-place refit (trailing static True =
            # "padded-lane costs pre-masked in-kernel, skip the lane<K
            # mask"); candidate->member assignment matches forward_ts
            return lambda seed, mean, std: (
                *ops.mlp_sample_rollout_costs_ensemble(
                    params, seed, obs_mat, mean, std, goal_state,
                    self.state_cost_weights, normalizers=norms,
                    alpha_action=self.action_cost_alpha,
                    num_candidates=K, n_members=n, return_padded=True,
                    **kkw), True)
        return build

    def _policy_collect(self, n):
        """Jitted: collect n MPC rollouts for given (params, norms, goal).

        CEM uses the whole-batch planner path (one cem_batched call per
        control step, fused rollout kernel); other planners keep the
        per-env vmapped policy."""
        if n not in self._jit_policy_collect_n:
            env = self.environment

            if self.planner is P.CEMPlanner:
                def collect(params, norms, goal, key):
                    policy = self._make_batched_policy(params, norms,
                                                       goal, n)
                    return env.get_rollouts_batched(
                        key, n, self.rollout_length,
                        policy_batched=policy, goal_state=goal,
                        policy_init=policy.init_carry)
            else:
                def collect(params, norms, goal, key):
                    policy = self._make_policy(params, norms, goal)
                    return env.get_rollouts(
                        key, n, self.rollout_length, policy=policy,
                        goal_state=goal, policy_init=policy.init_carry)

            self._jit_policy_collect_n[n] = jax.jit(collect)
        return self._jit_policy_collect_n[n]

    def _reset_goal(self):
        self.training_goal_state = self.environment.set_goal(
            self._next_key())

    def _record_metrics(self, rolls, rollout_type):
        super()._record_metrics(rolls, rollout_type)
        if self.writer is None or self.training_goal_state is None:
            return
        vecs = (rolls.observations if self.obs_only else rolls.states)
        sc = np.asarray(Mo.smooth_abs_loss(
            vecs, self.training_goal_state,
            self.state_cost_weights).sum(-1))
        ac = np.asarray(Mo.cosh_loss(
            rolls.actions, self.action_cost_alpha).sum(-1))
        for name, vals in [('State', sc), ('Action', ac),
                           ('Total', sc + ac)]:
            self.writer.add_scalar(f'AvgRollout{name}Costs/{rollout_type}',
                                   vals.mean(), self.train_iterations)
            self.writer.add_histogram(f'Rollout{name}Costs/{rollout_type}',
                                      vals, self.train_iterations)

    def train(self):
        """Seed rollouts -> [fit -> collect] x N (agents.py:282-295)."""
        logger.info('Starting outer training loop.')
        self._reset_goal()
        self.add_rollouts(num_rollouts=self.num_initial_rollouts,
                          goal_state=self.training_goal_state)
        for iteration in range(1, self.num_train_iterations + 1):
            logger.info('Iteration %d', iteration)
            self._reset_goal()
            self.train_iterations = iteration
            self.fit_model()
            norms = self._normalizers()
            collect = self._policy_collect(self.num_rollouts_per_iteration)
            self.add_rollouts(
                policy_collect=lambda key, goal: collect(
                    self.params, norms, goal, key),
                goal_state=self.training_goal_state)

    def get_action(self, key, obs_vec, carry=None, t=0):
        norms = self._normalizers()
        policy = self._make_policy(self.params, norms,
                                   self.training_goal_state)
        if carry is None:
            carry = policy.init_carry()
        return policy(key, jnp.asarray(t), None, obs_vec, carry)


class RewardAgent(MPCAgent):
    """Plans against the learned reward head (agents.py:300-379)."""

    def _make_policy(self, params, norms):
        env = self.environment

        def model_fn(s, a):
            s_next, _ = self.model.forward(params, s, a, norms)
            return s_next

        def cost(states, actions):
            # one-step lookahead reward of the *resulting* state sequence:
            # cost = -r_hat(s, a) evaluated along the trajectory
            _, r = self.model.forward(params, states, actions, norms)
            return -r[..., 0]

        return MPCPolicy(
            model=model_fn, cost=cost, planner=self.planner,
            sample_action=env.sample_action, horizon=self.horizon,
            action_dim=env.action_dim, obs_dim=env.observation_dim,
            planner_kwargs=self.planner_kwargs)

    def _policy_collect(self, n):
        if not hasattr(self, '_jit_collects'):
            self._jit_collects = {}
        if n not in self._jit_collects:
            env = self.environment

            def collect(params, norms, key):
                policy = self._make_policy(params, norms)
                return env.get_rollouts(
                    key, n, self.rollout_length, policy=policy,
                    policy_init=policy.init_carry)

            self._jit_collects[n] = jax.jit(collect)
        return self._jit_collects[n]

    def train(self):
        logger.info('Starting outer training loop.')
        self.add_rollouts(num_rollouts=self.num_initial_rollouts)
        for iteration in range(1, self.num_train_iterations + 1):
            logger.info('Iteration %d', iteration)
            self.train_iterations = iteration
            self.fit_model()
            norms = self._normalizers()
            collect = self._policy_collect(self.num_rollouts_per_iteration)
            self.add_rollouts(
                policy_collect=lambda key, goal: collect(
                    self.params, norms, key))

    def get_action(self, key, obs_vec, carry=None, t=0):
        norms = self._normalizers()
        policy = self._make_policy(self.params, norms)
        if carry is None:
            carry = policy.init_carry()
        return policy(key, jnp.asarray(t), None, obs_vec, carry)
