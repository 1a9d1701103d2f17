"""Dynamics model families as pure-function pytrees.

Capability parity with the reference's model zoo (``src/mbrl/models.py``):

* :class:`MLPDynamics`  — 2x50 ReLU MLP state-transition net with optional
  Gaussian output noise (models.py:96-110 `Model`).
* :class:`LinearDynamics` — single affine map (models.py:113-122).
* :class:`RewardDynamics` — shared trunk with next-state + scalar reward
  heads (models.py:125-217 `ModelWithReward`).
* :class:`EnsembleDynamics` — N independent parameter sets evaluated with
  `vmap` over the ensemble axis (new capability; required by the
  walker-walk north-star config).

Normalization hooks mirror the reference's forward-time (un)normalization
closures bound from dataset statistics (agents.py:218-230): here they are a
:class:`Normalizers` pytree so they jit with the planner.

TPU notes: forwards batch over candidates/transitions as a leading axis so
the (B, in) x (in, hidden) matmuls land on the MXU; planners evaluate the
model inside `vmap`/`scan` and XLA fuses activation+bias into the matmul.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Normalizers:
    """Forward-time normalization bundle (None members = identity)."""
    state_mean: Optional[jnp.ndarray] = None
    state_std: Optional[jnp.ndarray] = None
    action_mean: Optional[jnp.ndarray] = None
    action_std: Optional[jnp.ndarray] = None
    reward_mean: Optional[jnp.ndarray] = None
    reward_std: Optional[jnp.ndarray] = None

    def norm_state(self, s):
        if self.state_mean is None:
            return s
        return (s - self.state_mean) / (self.state_std + 1e-6)

    def unnorm_state(self, s):
        if self.state_mean is None:
            return s
        return s * (self.state_std + 1e-6) + self.state_mean

    def norm_action(self, a):
        if self.action_mean is None:
            return a
        return (a - self.action_mean) / (self.action_std + 1e-6)

    def unnorm_reward(self, r):
        if self.reward_mean is None:
            return r
        return r * (self.reward_std + 1e-6) + self.reward_mean


def _dense_init(key, n_in, n_out, dtype):
    """LeCun-uniform fan-in init (torch nn.Linear default semantics)."""
    k1, k2 = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(n_in)
    w = jax.random.uniform(k1, (n_in, n_out), dtype, -bound, bound)
    b = jax.random.uniform(k2, (n_out,), dtype, -bound, bound)
    return {'w': w, 'b': b}


def _dense(params, x):
    return x @ params['w'] + params['b']


class MLPDynamics:
    """s' = MLP([s; a]) with optional output noise.

    `forward(params, state, action, normalizers, key=None)` operates on
    (..., dim) batches; normalization follows DynamicsModel.forward
    (models.py:13-29): inputs normalized, output unnormalized.
    """

    def __init__(self, state_dim: int, action_dim: int,
                 hidden_units: int = 50, noise: Optional[float] = None,
                 dtype=jnp.float32):
        self.state_dim = state_dim
        self.action_dim = action_dim
        self.hidden_units = hidden_units
        self.noise = noise
        self.dtype = dtype

    def init(self, key: jax.Array) -> Dict[str, Any]:
        k1, k2, k3 = jax.random.split(key, 3)
        h = self.hidden_units
        return {
            'l1': _dense_init(k1, self.state_dim + self.action_dim, h,
                              self.dtype),
            'l2': _dense_init(k2, h, h, self.dtype),
            'l3': _dense_init(k3, h, self.state_dim, self.dtype),
        }

    def _net(self, params, x):
        x = jax.nn.relu(_dense(params['l1'], x))
        x = jax.nn.relu(_dense(params['l2'], x))
        return _dense(params['l3'], x)

    def forward(self, params, state, action,
                normalizers: Optional[Normalizers] = None,
                key: Optional[jax.Array] = None):
        n = normalizers or Normalizers()
        x = jnp.concatenate([n.norm_state(state), n.norm_action(action)],
                            axis=-1)
        out = self._net(params, x)
        if self.noise is not None and key is not None:
            out = out + jax.random.normal(key, out.shape, out.dtype) * \
                self.noise
        return n.unnorm_state(out)

    def loss(self, params, batch, normalizers: Optional[Normalizers] = None):
        """Multistep teacher-forced MSE (models.py:69-87): batch dims
        (B, h, dim); loss summed over horizon, mean over batch/dim.

        Computed in normalized space, matching the reference's training on
        z-normalized transitions (data.py:205-227 feeds normalized inputs
        AND outputs to the MSE)."""
        n = normalizers or Normalizers()
        x = jnp.concatenate([n.norm_state(batch['states']),
                             n.norm_action(batch['actions'])], axis=-1)
        pred = self._net(params, x)
        target = n.norm_state(batch['next_states'])
        per_step = jnp.mean((pred - target) ** 2,
                            axis=(0,) + tuple(range(2, pred.ndim)))
        return per_step.sum()


class LinearDynamics(MLPDynamics):
    """Single affine layer (models.py:113-122)."""

    def init(self, key: jax.Array):
        return {'l1': _dense_init(key, self.state_dim + self.action_dim,
                                  self.state_dim, self.dtype)}

    def _net(self, params, x):
        return _dense(params['l1'], x)


class RewardDynamics:
    """Joint next-state + reward model (ModelWithReward, models.py:125-217)."""

    def __init__(self, state_dim: int, action_dim: int,
                 hidden_units: int = 200, dtype=jnp.float32):
        self.state_dim = state_dim
        self.action_dim = action_dim
        self.hidden_units = hidden_units
        self.dtype = dtype

    def init(self, key: jax.Array):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        h = self.hidden_units
        return {
            'l1': _dense_init(k1, self.state_dim + self.action_dim, h,
                              self.dtype),
            'l2': _dense_init(k2, h, h, self.dtype),
            'state_head': _dense_init(k3, h, self.state_dim, self.dtype),
            'reward_head': _dense_init(k4, h, 1, self.dtype),
        }

    def forward(self, params, state, action,
                normalizers: Optional[Normalizers] = None,
                key: Optional[jax.Array] = None
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        n = normalizers or Normalizers()
        x = jnp.concatenate([n.norm_state(state), n.norm_action(action)],
                            axis=-1)
        x = jax.nn.relu(_dense(params['l1'], x))
        x = jax.nn.relu(_dense(params['l2'], x))
        s = _dense(params['state_head'], x)
        r = _dense(params['reward_head'], x)
        return n.unnorm_state(s), n.unnorm_reward(r)

    def loss(self, params, batch, normalizers: Optional[Normalizers] = None):
        """Joint state+reward MSE in normalized space (models.py:165-217)."""
        n = normalizers or Normalizers()
        x = jnp.concatenate([n.norm_state(batch['states']),
                             n.norm_action(batch['actions'])], axis=-1)
        h = jax.nn.relu(_dense(params['l1'], x))
        h = jax.nn.relu(_dense(params['l2'], h))
        pred_s = _dense(params['state_head'], h)
        pred_r = _dense(params['reward_head'], h)
        target_s = n.norm_state(batch['next_states'])
        target_r = batch['rewards']
        if n.reward_mean is not None:
            target_r = (target_r - n.reward_mean[0]) / (n.reward_std[0]
                                                        + 1e-6)
        s_loss = jnp.mean((pred_s - target_s) ** 2,
                          axis=(0,) + tuple(range(2, pred_s.ndim))).sum()
        r_loss = jnp.mean((pred_r[..., 0] - target_r) ** 2, axis=0).sum()
        return s_loss + r_loss, {'state_loss': s_loss, 'reward_loss': r_loss}


class EnsembleDynamics:
    """N-member ensemble of any base dynamics family via a vmap axis.

    * Training: each member fits a BOOTSTRAP resample of every minibatch
      (indices drawn with replacement per member, PETS-style) when `loss`
      is given a key; identical batches otherwise.
    * Planning: `forward_ts` does TS-infinity trajectory-sampling
      propagation — candidate row k is predicted by member k % n for the
      whole horizon, so the candidate population explores the ensemble's
      epistemic spread instead of collapsing to the mean. The strided
      assignment is the same one the fused-kernel path uses
      (agents.mpc._sample_costs_builder interleaves per-member kernel
      slices), so both paths plan through identical dynamics.
    * `forward` (mean) stays the default for single-state prediction.
    """

    def __init__(self, base: MLPDynamics, n_ensemble: int = 5):
        self.base = base
        self.n = n_ensemble
        self.state_dim = base.state_dim
        self.action_dim = base.action_dim
        self.noise = base.noise

    def init(self, key: jax.Array):
        return jax.vmap(self.base.init)(jax.random.split(key, self.n))

    def forward_all(self, params, state, action,
                    normalizers: Optional[Normalizers] = None,
                    key: Optional[jax.Array] = None):
        return jax.vmap(
            lambda p: self.base.forward(p, state, action, normalizers))(
                params)

    def forward(self, params, state, action,
                normalizers: Optional[Normalizers] = None,
                key: Optional[jax.Array] = None):
        return self.forward_all(params, state, action, normalizers).mean(0)

    def forward_ts(self, params, state, action,
                   normalizers: Optional[Normalizers] = None,
                   key: Optional[jax.Array] = None):
        """TS-infinity member propagation for a candidate batch.

        state/action: (N, dim) with N divisible by n; row k -> member
        k % n. Striding (not contiguous blocks) keeps the mapping
        identical whether rows are (K,) for one env or (B*K,) b-major
        for the batched planner (K % n == 0 makes b*K + k = k mod n).
        Falls back to the ensemble mean if N is not divisible.
        """
        N = state.shape[0]
        if N % self.n:
            return self.forward(params, state, action, normalizers)
        sg = state.reshape(N // self.n, self.n, -1).transpose(1, 0, 2)
        ag = action.reshape(N // self.n, self.n, -1).transpose(1, 0, 2)
        out = jax.vmap(
            lambda p, s, a: self.base.forward(p, s, a, normalizers))(
                params, sg, ag)                       # (n, N/n, sd)
        return out.transpose(1, 0, 2).reshape(N, -1)

    def loss(self, params, batch, normalizers: Optional[Normalizers] = None,
             key: Optional[jax.Array] = None):
        if key is None:
            losses = jax.vmap(
                lambda p: self.base.loss(p, batch, normalizers))(params)
            return losses.sum()

        B = batch['states'].shape[0]

        def member_loss(p, k):
            idx = jax.random.randint(k, (B,), 0, B)
            boot = jax.tree_util.tree_map(lambda v: v[idx], batch)
            return self.base.loss(p, boot, normalizers)

        losses = jax.vmap(member_loss)(params,
                                       jax.random.split(key, self.n))
        return losses.sum()
