"""On-device model fitting: the train_model / evaluate_model pair.

Replaces the reference's DataLoader epoch loop
(``src/mbrl/models.py:53-93``) with a single jitted `lax.scan` over
shuffled minibatches: every epoch visits each stored transition once
(TransitionsSampler semantics, data.py:271-283), gradients and optimizer
updates stay in HBM, and the whole fit is one XLA program per epoch count.

Defaults mirror the reference: batch_size=512, num_epochs=50, MSE loss,
Adam (optimizer construction in experiment.py:55-62).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..data import replay as R


class TrainLog(NamedTuple):
    losses: jnp.ndarray       # (num_updates,) per-minibatch loss
    final_loss: jnp.ndarray


def _model_loss(model, params, batch, normalizers, key=None):
    import inspect
    if key is not None and 'key' in inspect.signature(
            model.loss).parameters:
        out = model.loss(params, batch, normalizers, key=key)
    else:
        out = model.loss(params, batch, normalizers)
    if isinstance(out, tuple):
        return out[0]
    return out


def make_normalizers(buf: R.ReplayBuffer, use_observations: bool = True):
    """Bind forward-time normalizers from dataset stats (agents.py:218-230).

    `use_observations` matches the reference agents' obs_only data mode:
    the 'state' the model sees is the flat observation vector.
    """
    from .dynamics import Normalizers
    key = 'observations' if use_observations else 'states'
    s = buf.stats[key]
    a = buf.stats['actions']
    r = buf.stats['rewards']
    return Normalizers(
        state_mean=s.mean, state_std=s.std,
        action_mean=a.mean, action_std=a.std,
        reward_mean=r.mean, reward_std=r.std)


def _batch_from_windows(win: Dict[str, jnp.ndarray], obs_only: bool):
    if obs_only:
        return dict(states=win['observations'], actions=win['actions'],
                    rewards=win['rewards'],
                    next_states=win['next_observations'])
    return dict(states=win['states'], actions=win['actions'],
                rewards=win['rewards'], next_states=win['next_states'])


def train_model(model, params, buf: R.ReplayBuffer, key: jax.Array,
                optimizer: Optional[optax.GradientTransformation] = None,
                opt_state=None,
                batch_size: int = 512, num_epochs: int = 50,
                horizon: int = 1, obs_only: bool = True,
                normalizers=None,
                normalize_targets: bool = False) -> Tuple[Any, Any, TrainLog]:
    """Fit `model` on the replay buffer. Returns (params, opt_state, log).

    The entire multi-epoch fit runs as one jitted scan; per-minibatch losses
    stream back for metric logging (models.py:89-92 writer behavior).
    """
    if optimizer is None:
        optimizer = optax.adam(0.01)
    if opt_state is None:
        opt_state = optimizer.init(params)

    per_roll = max(buf.rollout_length - horizon + 1, 1)
    total = buf.capacity_rollouts * per_roll
    num_batches = max(total // batch_size, 1)

    def epoch(carry, ekey):
        params, opt_state = carry
        sample_key, boot_key = jax.random.split(ekey)
        roll_idx, start = R.epoch_batches(buf, sample_key, batch_size,
                                          horizon)
        # per-minibatch keys for ensemble bootstrap resampling
        bkeys = jax.random.split(boot_key, roll_idx.shape[0])

        def minibatch(carry, idx):
            params, opt_state = carry
            ri, st, bk = idx
            win = R.gather_windows(buf, ri, st, horizon)
            batch = _batch_from_windows(win, obs_only)
            loss, grads = jax.value_and_grad(
                lambda p: _model_loss(model, p, batch, normalizers,
                                      key=bk))(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            minibatch, (params, opt_state), (roll_idx, start, bkeys))
        return (params, opt_state), losses

    ekeys = jax.random.split(key, num_epochs)
    (params, opt_state), losses = jax.lax.scan(
        epoch, (params, opt_state), ekeys)
    losses = losses.reshape(-1)
    return params, opt_state, TrainLog(losses=losses, final_loss=losses[-1])


def evaluate_model(model, params, buf: R.ReplayBuffer, key: jax.Array,
                   batch_size: int = 512, horizon: int = 1,
                   obs_only: bool = True, normalizers=None) -> jnp.ndarray:
    """Mean MSE over sampled transitions (models.py:31-51)."""
    win = R.sample_transitions(buf, key, batch_size, horizon)
    batch = _batch_from_windows(win, obs_only)
    return _model_loss(model, params, batch, normalizers)
