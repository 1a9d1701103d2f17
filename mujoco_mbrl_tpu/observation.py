"""Composer observation pipeline: buffering, delays, corruptors,
aggregators — as a pure carried-state transform.

Functional re-design of ``dm_control/composer/observation/updater.py:90``
and ``obs_buffer.py:53``: instead of a stateful updater mutating python
deques per physics substep, each configured observable owns a fixed-shape
buffer pytree carried through the env scan:

* ``pending``: (delay+1, *shape) conveyor — a sample written at step t
  matures ``delay`` control steps later (obs_buffer's delayed arrivals).
* ``ring``: (buffer_size, *shape) of matured samples, newest last
  (obs_buffer's bounded buffer).

Deviation (documented): sampling granularity is the CONTROL step, not the
physics substep — the substep loop is a fused ``lax.scan`` whose
intermediate forward products are never materialized (composer.py's
design notes). ``update_interval`` is therefore measured in control
steps. Everything else (delay semantics, bounded buffer, aggregators,
corruptors with explicit PRNG keys) follows the reference contract.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

AGGREGATORS: Dict[str, Callable] = {
    'mean': lambda buf: jnp.mean(buf, axis=0),
    'median': lambda buf: jnp.median(buf, axis=0),
    'max': lambda buf: jnp.max(buf, axis=0),
    'min': lambda buf: jnp.min(buf, axis=0),
    'sum': lambda buf: jnp.sum(buf, axis=0),
}


class ObservableSpec:
    """Per-observable pipeline options (observable.Observable's
    enabled/update_interval/buffer_size/delay/aggregator/corruptor)."""

    def __init__(self, update_interval: int = 1, buffer_size: int = 1,
                 delay: int = 0, aggregator=None,
                 corruptor: Optional[Callable] = None,
                 enabled: bool = True):
        if isinstance(aggregator, str):
            aggregator = AGGREGATORS[aggregator]
        self.update_interval = int(update_interval)
        self.buffer_size = int(buffer_size)
        self.delay = int(delay)
        self.aggregator = aggregator
        self.corruptor = corruptor
        self.enabled = enabled


@struct.dataclass
class BufferState:
    pending: jnp.ndarray   # (delay+1, *shape) conveyor toward maturity
    ring: jnp.ndarray      # (buffer_size, *shape), newest last
    step: jnp.ndarray      # int32 control-step counter


def init_buffer(spec: ObservableSpec, value: jnp.ndarray) -> BufferState:
    """Fill buffers with the initial sample (the updater primes buffers
    at episode start so the first observation is well-defined)."""
    value = jnp.asarray(value)
    pending = jnp.broadcast_to(value, (spec.delay + 1,) + value.shape)
    ring = jnp.broadcast_to(value, (spec.buffer_size,) + value.shape)
    return BufferState(pending=jnp.array(pending), ring=jnp.array(ring),
                       step=jnp.zeros((), jnp.int32))


def update_buffer(spec: ObservableSpec, st: BufferState,
                  value: jnp.ndarray,
                  key: Optional[jax.Array] = None) -> BufferState:
    """Advance one control step: sample (every update_interval steps,
    corrupted if configured), age the delay conveyor, absorb matured
    samples into the bounded ring."""
    value = jnp.asarray(value)
    if spec.corruptor is not None:
        if key is None:
            raise ValueError('corruptor configured but no key provided')
        value = spec.corruptor(key, value)
    do_sample = (st.step % spec.update_interval) == 0

    # conveyor: slot i matures in i steps. Insert the new sample at slot
    # `delay` FIRST (so delay=0 matures this very step), then pop slot 0
    # and shift.
    inserted = jnp.where(do_sample,
                         st.pending.at[spec.delay].set(value),
                         st.pending)
    matured = inserted[0]
    pending = jnp.concatenate([inserted[1:], inserted[-1:]], axis=0)
    # a sample matures now iff one was taken `delay` steps ago
    took_then = ((st.step - spec.delay) % spec.update_interval == 0) & \
        (st.step >= spec.delay)
    ring = jnp.where(
        took_then,
        jnp.concatenate([st.ring[1:], matured[None]], axis=0),
        st.ring)
    return BufferState(pending=pending, ring=ring, step=st.step + 1)


def read_buffer(spec: ObservableSpec, st: BufferState) -> jnp.ndarray:
    """Observation value: aggregator over the ring, the raw ring when
    buffer_size > 1 and no aggregator (updater returns the stacked
    buffer), or the newest sample."""
    if spec.aggregator is not None:
        return spec.aggregator(st.ring)
    if spec.buffer_size > 1:
        return st.ring
    return st.ring[-1]


class BufferedEnvironment:
    """Wrap a control.Environment with the observation pipeline.

    Observables without a spec pass through untouched; spec'd ones are
    buffered/delayed/corrupted. Carried state extends the inner EnvState
    with per-observable BufferStates and a PRNG key for corruptors.
    """

    def __init__(self, env, specs: Dict[str, ObservableSpec]):
        self._env = env
        self._specs = dict(specs)

    def __getattr__(self, name):
        return getattr(self._env, name)

    def _process(self, buffers, key, obs):
        new_buffers = {}
        out = dict(obs)
        for name, spec in self._specs.items():
            if not spec.enabled:
                out.pop(name, None)
                continue
            key, sub = jax.random.split(key)
            st = update_buffer(spec, buffers[name], obs[name], sub)
            new_buffers[name] = st
            out[name] = read_buffer(spec, st)
        return new_buffers, key, out

    def reset(self, key):
        key, obs_key = jax.random.split(key)
        inner_state, ts = self._env.reset(key)
        buffers = {name: init_buffer(spec, ts.observation[name])
                   for name, spec in self._specs.items()
                   if spec.enabled}
        obs = dict(ts.observation)
        for name, spec in self._specs.items():
            if spec.enabled:
                obs[name] = read_buffer(spec, buffers[name])
            else:
                obs.pop(name, None)
        state = dict(inner=inner_state, buffers=buffers, key=obs_key)
        return state, ts.replace(observation=obs)

    def step(self, state, action):
        inner_state, ts = self._env.step(state['inner'], action)
        buffers, key, obs = self._process(state['buffers'], state['key'],
                                          ts.observation)
        new_state = dict(inner=inner_state, buffers=buffers, key=key)
        return new_state, ts.replace(observation=obs)

    def step_with_data(self, state, action):
        # collection-path variant (control.Environment.step_with_data):
        # without this override __getattr__ would hand the buffered dict
        # state to the inner env (AttributeError) and skip the pipeline
        inner_state, ts, data = self._env.step_with_data(
            state['inner'], action)
        buffers, key, obs = self._process(state['buffers'], state['key'],
                                          ts.observation)
        new_state = dict(inner=inner_state, buffers=buffers, key=key)
        return new_state, ts.replace(observation=obs), data
