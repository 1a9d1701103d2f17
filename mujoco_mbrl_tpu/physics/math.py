"""Quaternion and 6D spatial algebra primitives (pure jnp, vmap-safe).

These are the scalar building blocks of the TPU-native physics engine. All
functions operate on single (unbatched) arrays; batching is obtained with
`jax.vmap` at the env layer so XLA sees one large fused program.

Conventions
-----------
* Quaternions are `(w, x, y, z)`, normalized, representing rotations from the
  local frame into the parent/world frame (same convention as MuJoCo's
  ``mju_*Quat`` helpers that back the reference stack through
  dm_control's ctypes bindings — see reference
  ``dm_control/dm_control/mujoco/wrapper/mjbindings``).
* Spatial motion vectors are ``(angular(3), linear(3))`` measured in the
  world frame about the world origin.
* Spatial force vectors are ``(torque(3), force(3))`` about the world origin.
"""

from __future__ import annotations

import jax.numpy as jnp


# --------------------------------------------------------------------------
# Quaternions
# --------------------------------------------------------------------------

def quat_mul(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product u*v of two wxyz quaternions."""
    w1, x1, y1, z1 = u[0], u[1], u[2], u[3]
    w2, x2, y2, z2 = v[0], v[1], v[2], v[3]
    return jnp.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ])


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rot(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate 3-vector v by quaternion q (local -> world)."""
    # v' = v + 2 * u x (u x v + w v) with u = q.xyz
    u = q[1:]
    w = q[0]
    uv = jnp.cross(u, v)
    return v + 2.0 * jnp.cross(u, uv + w * v)


def quat_rot_inv(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate v by q^{-1} (world -> local)."""
    return quat_rot(quat_conj(q), v)


def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    """3x3 rotation matrix of quaternion q (columns = local axes in world)."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ], dtype=q.dtype)


def axis_angle_quat(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Quaternion for rotation of `angle` radians about unit `axis`."""
    half = 0.5 * angle
    s = jnp.sin(half)
    return jnp.concatenate([jnp.cos(half)[None], axis * s])


def quat_integrate(q: jnp.ndarray, omega_local: jnp.ndarray,
                   dt: jnp.ndarray) -> jnp.ndarray:
    """Integrate quaternion by local-frame angular velocity over dt.

    Matches MuJoCo's ``mju_quatIntegrate``: rotate about the (local) axis
    omega/|omega| by |omega|*dt, then renormalize.
    """
    angle = jnp.linalg.norm(omega_local) * dt
    # Safe normalize: falls back to x-axis when omega == 0 (angle == 0).
    norm = jnp.linalg.norm(omega_local)
    axis = jnp.where(norm > 1e-12, omega_local / jnp.where(norm > 1e-12, norm, 1.0),
                     jnp.array([1.0, 0.0, 0.0], dtype=q.dtype))
    dq = axis_angle_quat(axis, angle)
    out = quat_mul(q, dq)
    return out / jnp.linalg.norm(out)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.linalg.norm(q)


# --------------------------------------------------------------------------
# 3D helpers
# --------------------------------------------------------------------------

def skew(v: jnp.ndarray) -> jnp.ndarray:
    """Cross-product matrix [v]x such that [v]x w = v x w."""
    z = jnp.zeros((), dtype=v.dtype)
    return jnp.array([
        [z, -v[2], v[1]],
        [v[2], z, -v[0]],
        [-v[1], v[0], z],
    ])


def normalize(v: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return v / jnp.maximum(jnp.linalg.norm(v), eps)


# --------------------------------------------------------------------------
# Spatial algebra: motion/force 6-vectors (ang, lin) in world frame @ origin
# --------------------------------------------------------------------------

def motion_cross(v: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """Spatial cross product v x m for motion vectors (Lie bracket)."""
    ang = jnp.cross(v[:3], m[:3])
    lin = jnp.cross(v[3:], m[:3]) + jnp.cross(v[:3], m[3:])
    return jnp.concatenate([ang, lin])


def force_cross(v: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """Spatial cross product v x* f for a force vector f."""
    ang = jnp.cross(v[:3], f[:3]) + jnp.cross(v[3:], f[3:])
    lin = jnp.cross(v[:3], f[3:])
    return jnp.concatenate([ang, lin])


def spatial_inertia(mass: jnp.ndarray, inertia_world: jnp.ndarray,
                    com_world: jnp.ndarray) -> jnp.ndarray:
    """6x6 spatial inertia about world origin.

    Args:
      mass: scalar body mass.
      inertia_world: 3x3 rotational inertia about the body CoM, world axes.
      com_world: CoM position in world frame.

    Returns I such that force = I @ motion for motion (ang, lin) at origin.
    """
    cx = skew(com_world)
    top_left = inertia_world + mass * (cx @ cx.T)
    top_right = mass * cx
    bot_left = mass * cx.T
    bot_right = mass * jnp.eye(3, dtype=inertia_world.dtype)
    return jnp.block([[top_left, top_right], [bot_left, bot_right]])
