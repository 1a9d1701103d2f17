"""Episode-initialization randomizers on jax.random.

Semantics follow the reference's randomizer contract
(``dm_control/dm_control/suite/utils/randomizers.py:39-60``):
  * bounded hinge/slide joints ~ Uniform(range)
  * unbounded hinges ~ Uniform(-pi, pi)
  * ball/free-joint quaternions ~ uniform on S^3 (linear dofs untouched)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..physics import model as M


def random_limited_quaternion(key: jax.Array, limit: float) -> jnp.ndarray:
    """Random quaternion with angle <= limit about a random axis."""
    k1, k2 = jax.random.split(key)
    axis = jax.random.normal(k1, (3,))
    axis = axis / jnp.maximum(jnp.linalg.norm(axis), 1e-12)
    angle = jax.random.uniform(k2, ()) * limit
    return jnp.concatenate([jnp.cos(angle / 2)[None],
                            axis * jnp.sin(angle / 2)])


def randomize_limited_and_rotational_joints(
        model: M.Model, qpos: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """Returns qpos with joints randomized per the reference's rules."""
    out = qpos
    keys = jax.random.split(key, max(model.njnt, 1))
    for j in range(model.njnt):
        jtype = model.jnt_type[j]
        adr = model.jnt_qposadr[j]
        limited = model.jnt_limited[j]
        kj = keys[j]
        if jtype == M.HINGE:
            if limited:
                val = jax.random.uniform(kj, (), minval=model.jnt_range[j, 0],
                                         maxval=model.jnt_range[j, 1])
            else:
                val = jax.random.uniform(kj, (), minval=-np.pi, maxval=np.pi)
            out = out.at[adr].set(val)
        elif jtype == M.SLIDE:
            if limited:
                val = jax.random.uniform(kj, (), minval=model.jnt_range[j, 0],
                                         maxval=model.jnt_range[j, 1])
                out = out.at[adr].set(val)
        elif jtype == M.BALL:
            if limited:
                q = random_limited_quaternion(kj, float(model.jnt_range[j, 1]))
            else:
                q = jax.random.normal(kj, (4,))
                q = q / jnp.maximum(jnp.linalg.norm(q), 1e-12)
            out = out.at[adr:adr + 4].set(q)
        elif jtype == M.FREE:
            if not limited:
                q = jax.random.normal(kj, (4,))
                q = q / jnp.maximum(jnp.linalg.norm(q), 1e-12)
                out = out.at[adr + 3:adr + 7].set(q)
    return out
