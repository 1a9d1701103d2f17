"""Soft-indicator reward shaping (jnp port of the tolerance() family).

Behavioral contract follows the reference's reward utilities
(``dm_control/dm_control/utils/rewards.py:28-150``): ``tolerance(x)`` is 1
inside [lower, upper] and decays through a chosen sigmoid outside, reaching
``value_at_margin`` at distance ``margin`` from the nearest bound.

All shape/validation logic runs at trace time on static Python floats;
the returned expression is pure jnp, so task reward functions vmap/jit
cleanly over env batches.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_DEFAULT_VALUE_AT_MARGIN = 0.1


def _sigmoids(x, value_at_1: float, sigmoid: str):
    """Maps x=0 -> 1 and |x|=1 -> value_at_1 with the requested shape."""
    if sigmoid in ('cosine', 'linear', 'quadratic'):
        if not 0 <= value_at_1 < 1:
            raise ValueError(
                '`value_at_1` must be nonnegative and smaller than 1, '
                'got {}.'.format(value_at_1))
    else:
        if not 0 < value_at_1 < 1:
            raise ValueError(
                '`value_at_1` must be strictly between 0 and 1, '
                'got {}.'.format(value_at_1))

    if sigmoid == 'gaussian':
        scale = np.sqrt(-2 * np.log(value_at_1))
        return jnp.exp(-0.5 * (x * scale) ** 2)
    if sigmoid == 'hyperbolic':
        scale = np.arccosh(1 / value_at_1)
        return 1 / jnp.cosh(x * scale)
    if sigmoid == 'long_tail':
        scale = np.sqrt(1 / value_at_1 - 1)
        return 1 / ((x * scale) ** 2 + 1)
    if sigmoid == 'cosine':
        scale = np.arccos(2 * value_at_1 - 1) / np.pi
        scaled_x = x * scale
        return jnp.where(jnp.abs(scaled_x) < 1,
                         (1 + jnp.cos(jnp.pi * scaled_x)) / 2, 0.0)
    if sigmoid == 'linear':
        scale = 1 - value_at_1
        scaled_x = x * scale
        return jnp.where(jnp.abs(scaled_x) < 1, 1 - jnp.abs(scaled_x), 0.0)
    if sigmoid == 'quadratic':
        scale = np.sqrt(1 - value_at_1)
        scaled_x = x * scale
        return jnp.where(jnp.abs(scaled_x) < 1, 1 - scaled_x ** 2, 0.0)
    if sigmoid == 'tanh_squared':
        scale = np.arctanh(np.sqrt(1 - value_at_1))
        return 1 - jnp.tanh(x * scale) ** 2
    raise ValueError('Unknown sigmoid type {!r}.'.format(sigmoid))


def tolerance(x, bounds=(0.0, 0.0), margin=0.0, sigmoid='gaussian',
              value_at_margin=_DEFAULT_VALUE_AT_MARGIN):
    """Returns 1 when x is within bounds, decaying to 0 outside.

    `bounds`, `margin`, `value_at_margin` must be static Python numbers
    (they are task constants in every suite task); `x` may be traced.
    """
    lower, upper = bounds
    if lower > upper:
        raise ValueError('Lower bound must be <= upper bound.')
    if margin < 0:
        raise ValueError('`margin` must be non-negative.')

    x = jnp.asarray(x)
    in_bounds = jnp.logical_and(lower <= x, x <= upper)
    if margin == 0:
        return jnp.where(in_bounds, 1.0, 0.0)
    d = jnp.where(x < lower, lower - x, x - upper) / margin
    return jnp.where(in_bounds, 1.0, _sigmoids(d, value_at_margin, sigmoid))
