"""Stochastic variation ops (composer/variation analogue, functional).

The reference's ``dm_control/composer/variation/{base,distributions,
noises}.py`` evaluates variation objects against a shared
``np.random.RandomState``; here every variation is a pure function of an
explicit PRNG key, so episode randomization and observation corruption
stay jit/vmap-safe.

* Distributions: callable ``dist(key, shape=()) -> sample``.
* Noises wrap a distribution into a corruptor ``noise(key, value) ->
  corrupted`` (additive / multiplicative, reference noises.py:30-70).
* ``evaluate`` resolves nested variation objects inside pytrees the way
  ``variation.evaluate`` does for attribute dicts.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp


class Variation:
    """Base: a callable (key, shape) -> array."""

    def __call__(self, key, shape=()):
        raise NotImplementedError


class Uniform(Variation):
    def __init__(self, low=0.0, high=1.0):
        self.low, self.high = low, high

    def __call__(self, key, shape=()):
        return jax.random.uniform(key, shape, minval=self.low,
                                  maxval=self.high)


class Normal(Variation):
    def __init__(self, loc=0.0, scale=1.0):
        self.loc, self.scale = loc, scale

    def __call__(self, key, shape=()):
        return self.loc + self.scale * jax.random.normal(key, shape)


class LogNormal(Variation):
    def __init__(self, mean=0.0, sigma=1.0):
        self.mean, self.sigma = mean, sigma

    def __call__(self, key, shape=()):
        return jnp.exp(self.mean + self.sigma * jax.random.normal(key,
                                                                  shape))


class Exponential(Variation):
    def __init__(self, scale=1.0):
        self.scale = scale

    def __call__(self, key, shape=()):
        return self.scale * jax.random.exponential(key, shape)


class Bernoulli(Variation):
    def __init__(self, prob=0.5):
        self.prob = prob

    def __call__(self, key, shape=()):
        return jax.random.bernoulli(key, self.prob, shape)


class UniformChoice(Variation):
    def __init__(self, choices: Sequence):
        self.choices = jnp.asarray(choices)

    def __call__(self, key, shape=()):
        idx = jax.random.randint(key, shape, 0, self.choices.shape[0])
        return self.choices[idx]


class UniformPointOnSphere(Variation):
    """Random unit vector (distributions.py UniformPointOnSphere)."""

    def __call__(self, key, shape=()):
        v = jax.random.normal(key, tuple(shape) + (3,))
        return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True),
                               1e-9)


# ---- noises: corruptors (key, value) -> corrupted value -----------------

class Additive:
    """value + dist sample (noises.py Additive)."""

    def __init__(self, dist: Variation):
        self.dist = dist

    def __call__(self, key, value):
        value = jnp.asarray(value)
        return value + self.dist(key, value.shape)


class Multiplicative:
    """value * dist sample (noises.py Multiplicative)."""

    def __init__(self, dist: Variation):
        self.dist = dist

    def __call__(self, key, value):
        value = jnp.asarray(value)
        return value * self.dist(key, value.shape)


def evaluate(obj: Any, key):
    """Resolve every Variation inside a pytree-like structure
    (variation/base.py evaluate): non-variations pass through; each
    variation gets an independent fold of `key`."""
    counter = [0]

    def resolve(x):
        if isinstance(x, Variation):
            counter[0] += 1
            return x(jax.random.fold_in(key, counter[0]))
        return x

    if isinstance(obj, dict):
        return {k: evaluate(v, jax.random.fold_in(key, hash(k) % (2**31)))
                for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(evaluate(v, jax.random.fold_in(key, i))
                         for i, v in enumerate(obj))
    return resolve(obj)
