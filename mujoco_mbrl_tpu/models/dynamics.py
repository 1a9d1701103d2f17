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


class RNNDynamics:
    """GRU sequence dynamics: s' = f(h', [s; a]), h' = GRU(h, [s; a]).

    The reference sketched (but never shipped) an RNN dynamics model —
    ``src/mbrl/agents_old.py:36-37,191-237`` references an undefined
    ``RNNModel`` with a `train_rnn` loop over rollout sequences. This is
    that capability, TPU-first: the recurrence is a `lax.scan` over the
    window axis, so multistep training (`loss` on (B, h, dim) windows,
    teacher-forced inputs, open-loop hidden state) and open-loop H-step
    rollout (`rollout`) are single fused programs.

    Planner integration: `model_fn_with_memory(params, h0)` returns a
    stateless-looking (s, a) -> s' closure that carries the hidden state
    in a closed-over ref is NOT jit-safe, so instead `rollout` is the
    planner surface: GradientDescentPlanner/CEM variants that roll whole
    action sequences can call it directly.
    """

    def __init__(self, state_dim: int, action_dim: int,
                 hidden_units: int = 64, dtype=jnp.float32):
        self.state_dim = state_dim
        self.action_dim = action_dim
        self.hidden_units = hidden_units
        self.noise = None
        self.dtype = dtype

    def init(self, key: jax.Array) -> Dict[str, Any]:
        ks = jax.random.split(key, 5)
        nin = self.state_dim + self.action_dim
        h = self.hidden_units
        return {
            'gru_rz': _dense_init(ks[0], nin + h, 2 * h, self.dtype),
            'gru_n': _dense_init(ks[1], nin + h, h, self.dtype),
            'head1': _dense_init(ks[2], h + nin, h, self.dtype),
            'head2': _dense_init(ks[3], h, self.state_dim, self.dtype),
        }

    def init_hidden(self, batch_shape=()) -> jnp.ndarray:
        return jnp.zeros(tuple(batch_shape) + (self.hidden_units,),
                         self.dtype)

    def _cell(self, params, h, x):
        xh = jnp.concatenate([x, h], axis=-1)
        rz = jax.nn.sigmoid(_dense(params['gru_rz'], xh))
        r, z = jnp.split(rz, 2, axis=-1)
        n = jnp.tanh(_dense(params['gru_n'],
                            jnp.concatenate([x, r * h], axis=-1)))
        h_new = (1.0 - z) * n + z * h
        return h_new

    def forward(self, params, state, action, hidden,
                normalizers: Optional[Normalizers] = None):
        """One transition: returns (next_state, next_hidden)."""
        n = normalizers or Normalizers()
        x = jnp.concatenate([n.norm_state(state), n.norm_action(action)],
                            axis=-1)
        h_new = self._cell(params, hidden, x)
        y = jax.nn.relu(_dense(params['head1'],
                               jnp.concatenate([h_new, x], axis=-1)))
        delta = _dense(params['head2'], y)
        return n.unnorm_state(n.norm_state(state) + delta), h_new

    def rollout(self, params, state0, actions,
                normalizers: Optional[Normalizers] = None,
                hidden0: Optional[jnp.ndarray] = None):
        """Open-loop rollout: actions (H, ..., ad) -> states (H, ..., sd).

        The model consumes its OWN predictions (agents_old.py
        test_H_step_pred semantics)."""
        if hidden0 is None:
            hidden0 = self.init_hidden(state0.shape[:-1])

        def step(carry, a):
            s, h = carry
            s2, h2 = self.forward(params, s, a, h, normalizers)
            return (s2, h2), s2

        _, states = jax.lax.scan(step, (state0, hidden0), actions)
        return states

    def loss(self, params, batch, normalizers: Optional[Normalizers] = None):
        """Teacher-forced multistep MSE over (B, h, dim) windows.

        Inputs are the TRUE states (teacher forcing, the reference's
        multistep_train feeds dataset transitions) while the hidden state
        runs open-loop across the window — the sequence-model analogue of
        MLPDynamics.loss."""
        n = normalizers or Normalizers()
        s = batch['states']          # (B, h, sd)
        a = batch['actions']
        target = n.norm_state(batch['next_states'])
        if s.ndim == 2:              # single-step batches: add window axis
            s, a = s[:, None], a[:, None]
            target = target[:, None]
        B = s.shape[0]
        h0 = self.init_hidden((B,))

        def step(h, xs):
            st, at = xs
            x = jnp.concatenate([n.norm_state(st), n.norm_action(at)],
                                axis=-1)
            h2 = self._cell(params, h, x)
            y = jax.nn.relu(_dense(params['head1'],
                                   jnp.concatenate([h2, x], axis=-1)))
            pred = n.norm_state(st) + _dense(params['head2'], y)
            return h2, pred

        _, preds = jax.lax.scan(step, h0,
                                (s.swapaxes(0, 1), a.swapaxes(0, 1)))
        preds = preds.swapaxes(0, 1)          # (B, h, sd)
        per_step = jnp.mean((preds - target) ** 2, axis=(0, 2))
        return per_step.sum()


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
