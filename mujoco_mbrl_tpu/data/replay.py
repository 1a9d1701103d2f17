"""Device-resident rollout ring buffer with running normalization stats.

Functional redesign of the reference's transitions dataset
(``src/mbrl/data.py:128-283``):

* ``TransitionsDataset`` kept a python list of ``Rollout`` objects with
  FIFO eviction by transition count (data.py:159-183). Here rollouts have a
  fixed length (the reference always collects fixed ``rollout_length``
  episodes, experiment.py:155), so storage is a preallocated
  ``(capacity_rollouts, T, dim)`` ring — eviction is an index wrap, O(1),
  no host round-trips.
* Dataset statistics {mean, std, min, max} per field (data.py:229-253) are
  recomputed on every add via masked reductions over valid rows.
* ``TransitionsSampler``'s every-transition-once epoch (data.py:271-283)
  becomes a `jax.random.permutation` over the valid (rollout, start) grid.
* Multistep horizon windows (data.py:106-114) are gathered with
  ``dynamic_slice`` under vmap.

Everything is a pytree; `add_rollouts`/`sample_transitions` jit and can be
sharded (replay lives per-host in multi-host runs, SURVEY §2.4).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class Rollouts:
    """A batch of fixed-length rollouts (the on-device `Rollout` analogue).

    Layout matches the reference's invariant len(states) == len(actions)+1
    (data.py:9-13): states/observations have T+1 entries, actions/rewards T.
    """
    states: jnp.ndarray        # (B, T+1, state_dim)
    observations: jnp.ndarray  # (B, T+1, obs_dim)
    actions: jnp.ndarray       # (B, T, act_dim)
    rewards: jnp.ndarray       # (B, T)

    @property
    def length(self) -> int:
        return self.actions.shape[-2]

    def sum_of_rewards(self) -> jnp.ndarray:
        return self.rewards.sum(axis=-1)


@struct.dataclass
class Stats:
    mean: jnp.ndarray
    std: jnp.ndarray
    min: jnp.ndarray
    max: jnp.ndarray


@struct.dataclass
class ReplayBuffer:
    states: jnp.ndarray        # (R, T+1, state_dim)
    observations: jnp.ndarray  # (R, T+1, obs_dim)
    actions: jnp.ndarray       # (R, T, act_dim)
    rewards: jnp.ndarray       # (R, T)
    cursor: jnp.ndarray        # int32: next write slot
    filled: jnp.ndarray        # int32: number of valid rollouts
    stats: Dict[str, Stats]

    @property
    def capacity_rollouts(self) -> int:
        return self.states.shape[0]

    @property
    def rollout_length(self) -> int:
        return self.actions.shape[1]


def _field_stats(x: jnp.ndarray, valid: jnp.ndarray) -> Stats:
    """Masked per-dim stats over (R, T, dim) with valid mask over R."""
    mask = valid.reshape(-1, *([1] * (x.ndim - 1)))
    n = jnp.maximum(valid.sum() * np.prod(x.shape[1:-1]), 1)
    xm = jnp.where(mask, x, 0.0)
    mean = xm.sum(axis=tuple(range(x.ndim - 1))) / n
    var = (jnp.where(mask, (x - mean) ** 2, 0.0)
           .sum(axis=tuple(range(x.ndim - 1))) / jnp.maximum(n - 1, 1))
    big = jnp.asarray(jnp.inf, x.dtype)
    mn = jnp.where(mask, x, big).min(axis=tuple(range(x.ndim - 1)))
    mx = jnp.where(mask, x, -big).max(axis=tuple(range(x.ndim - 1)))
    return Stats(mean=mean, std=jnp.sqrt(var), min=mn, max=mx)


def compute_stats(buf: ReplayBuffer) -> Dict[str, Stats]:
    valid = (jnp.arange(buf.capacity_rollouts) < buf.filled)
    return {
        'states': _field_stats(buf.states, valid),
        'observations': _field_stats(buf.observations, valid),
        'actions': _field_stats(buf.actions, valid),
        'rewards': _field_stats(buf.rewards[..., None], valid),
    }


def init_replay(capacity_rollouts: int, rollout_length: int,
                state_dim: int, obs_dim: int, act_dim: int,
                dtype=jnp.float32) -> ReplayBuffer:
    R, T = capacity_rollouts, rollout_length
    zeros = lambda *s: jnp.zeros(s, dtype)
    buf = ReplayBuffer(
        states=zeros(R, T + 1, state_dim),
        observations=zeros(R, T + 1, obs_dim),
        actions=zeros(R, T, act_dim),
        rewards=zeros(R, T),
        cursor=jnp.zeros((), jnp.int32),
        filled=jnp.zeros((), jnp.int32),
        stats={},
    )
    return buf.replace(stats=compute_stats(buf))


def add_rollouts(buf: ReplayBuffer, rolls: Rollouts) -> ReplayBuffer:
    """Write a batch of rollouts at the ring cursor; refresh stats."""
    B = rolls.actions.shape[0]
    R = buf.capacity_rollouts
    idx = (buf.cursor + jnp.arange(B)) % R
    buf = buf.replace(
        states=buf.states.at[idx].set(rolls.states),
        observations=buf.observations.at[idx].set(rolls.observations),
        actions=buf.actions.at[idx].set(rolls.actions),
        rewards=buf.rewards.at[idx].set(rolls.rewards),
        cursor=(buf.cursor + B) % R,
        filled=jnp.minimum(buf.filled + B, R),
    )
    return buf.replace(stats=compute_stats(buf))


def num_transitions(buf: ReplayBuffer, horizon: int = 1) -> jnp.ndarray:
    per_roll = buf.rollout_length - horizon + 1
    return buf.filled * per_roll


def _gather_window(arr, roll_idx, start, length):
    """arr: (R, T?, d) -> (length, d) window from one rollout."""
    return jax.lax.dynamic_slice(
        arr[roll_idx], (start, 0), (length, arr.shape[-1]))


def sample_transitions(buf: ReplayBuffer, key: jax.Array, batch_size: int,
                       horizon: int = 1):
    """Uniformly sample multistep transition windows.

    Returns dict with leading dims (batch, horizon):
      states (B,h,sd), observations, actions (B,h,ad),
      rewards (B,h), next_states (B,h,sd), next_observations.
    """
    k1, k2 = jax.random.split(key)
    per_roll = buf.rollout_length - horizon + 1
    roll_idx = jax.random.randint(k1, (batch_size,), 0,
                                  jnp.maximum(buf.filled, 1))
    start = jax.random.randint(k2, (batch_size,), 0, per_roll)
    return gather_windows(buf, roll_idx, start, horizon)


def gather_windows(buf: ReplayBuffer, roll_idx, start, horizon: int):
    def one(ri, st):
        s = _gather_window(buf.states, ri, st, horizon + 1)
        o = _gather_window(buf.observations, ri, st, horizon + 1)
        a = _gather_window(buf.actions, ri, st, horizon)
        r = jax.lax.dynamic_slice(buf.rewards[ri], (st,), (horizon,))
        return dict(states=s[:-1], observations=o[:-1], actions=a,
                    rewards=r, next_states=s[1:], next_observations=o[1:])

    return jax.vmap(one)(roll_idx, start)


def epoch_batches(buf: ReplayBuffer, key: jax.Array, batch_size: int,
                  horizon: int = 1):
    """Every valid (rollout, start) pair once, shuffled, in fixed batches.

    Capacity-static analogue of TransitionsSampler (data.py:271-283): the
    permutation covers the full (R * per_roll) grid; entries from unfilled
    rollouts are remapped into valid ones so batch shapes stay static. When
    the buffer is full this is exactly an epoch.
    Yields (num_batches, batch) index pairs for use under lax.scan/fori.
    """
    R = buf.capacity_rollouts
    # Valid window starts: T - horizon + 1 (include the final transition).
    # DELIBERATE divergence from the reference sampler, which excludes the
    # tail start (data.py:278 `range(len(roll) - horizon)`) even though
    # its own capacity accounting counts it (data.py:166,188) — that
    # inconsistency means the last transition of every rollout is never
    # trained on there. We train on it; sample_transitions and
    # num_transitions here already count it.
    per_roll = max(buf.rollout_length - horizon + 1, 1)
    total = R * per_roll
    key, fill_key = jax.random.split(key)
    perm = jax.random.permutation(key, total)
    roll_idx = perm // per_roll
    start = perm % per_roll
    # Remap entries pointing at unfilled rollouts onto uniformly-random
    # valid ones. A plain `roll_idx % filled` would over-weight low-index
    # rollouts while the buffer fills (exactly when the model is most
    # data-distribution sensitive); an independent uniform draw keeps every
    # filled rollout equally likely.
    filled = jnp.maximum(buf.filled, 1)
    rand_valid = jnp.floor(
        jax.random.uniform(fill_key, roll_idx.shape) * filled
    ).astype(roll_idx.dtype)
    rand_valid = jnp.minimum(rand_valid, filled - 1)
    roll_idx = jnp.where(roll_idx < filled, roll_idx, rand_valid)
    num_batches = total // batch_size
    roll_idx = roll_idx[:num_batches * batch_size].reshape(num_batches,
                                                           batch_size)
    start = start[:num_batches * batch_size].reshape(num_batches, batch_size)
    return roll_idx, start


# --------------------------------------------------------------------------
# Normalization (data.py:255-260 semantics)
# --------------------------------------------------------------------------

def normalize(value: jnp.ndarray, stats: Stats,
              eps: float = 1e-6) -> jnp.ndarray:
    return (value - stats.mean) / (stats.std + eps)


def unnormalize(value: jnp.ndarray, stats: Stats,
                eps: float = 1e-6) -> jnp.ndarray:
    return value * (stats.std + eps) + stats.mean
