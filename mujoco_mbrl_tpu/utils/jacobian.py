"""Jacobian helper (reference ``src/mbrl/utils.py:11-31`` compute_jacobian).

The reference looped per-output backward passes through torch autograd;
here it is one `jax.jacobian` call (forward- or reverse-mode picked by
output/input width) — used by the iLQR planner for dynamics linearization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_jacobian(fn, inputs: jnp.ndarray) -> jnp.ndarray:
    """d fn(x) / d x with shape (*fn(x).shape, *x.shape)."""
    out_dim = jnp.size(fn(inputs))
    in_dim = jnp.size(inputs)
    if out_dim >= in_dim:
        return jax.jacfwd(fn)(inputs)
    return jax.jacrev(fn)(inputs)
