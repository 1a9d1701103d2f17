"""Mesh construction and SPMD helpers.

The canonical layout (SURVEY §2.4, §7.6): one mesh axis `'env'` for
everything embarrassingly parallel (env instances, CEM candidates, replay
shards, train microbatches); model parameters replicated. The mesh is
N-dimensional-ready — add axes without touching call sites.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def distributed_init(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host control-plane init (jax.distributed). No-op when no
    coordinator is configured (single-host runs)."""
    if coordinator_address is None:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_mesh(axis_names: Sequence[str] = ('env',),
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D (or reshaped N-D) mesh over all available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if len(axis_names) == 1:
        shape = (n,)
    elif len(axis_names) == 2:
        # hosts x local-devices when possible, else 1 x n
        nproc = jax.process_count()
        shape = (nproc, n // nproc) if n % max(nproc, 1) == 0 else (1, n)
    else:
        raise ValueError('1 or 2 mesh axes supported')
    dev_array = np.array(devices).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))


def shard_batch(mesh: Mesh, axis: str = 'env') -> NamedSharding:
    """Sharding for arrays with a leading batch axis split over `axis`."""
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def sharded_collect(mesh: Mesh, wrapper, num_rollouts: int, num_steps: int,
                    policy=None, policy_init=None, axis: str = 'env'):
    """Build a jitted rollout collector whose env batch is sharded.

    Returns `collect(key, goal_state=None) -> Rollouts` with every rollout
    array sharded over `axis` on its leading dimension. Lockstep env
    stepping never communicates, so XLA compiles to fully parallel
    per-device programs — the reference's worker pool with zero transport
    cost (parallel.py pickled every Rollout through OS pipes).
    """
    if num_rollouts % mesh.shape[axis] != 0:
        raise ValueError(
            f'num_rollouts {num_rollouts} must divide over mesh axis '
            f'{axis} of size {mesh.shape[axis]}')
    out_sharding = NamedSharding(mesh, P(axis))

    def collect(key, goal_state=None):
        return wrapper.get_rollouts(
            key, num_rollouts, num_steps, policy=policy,
            goal_state=goal_state, policy_init=policy_init)

    return jax.jit(collect, out_shardings=out_sharding)


def dp_train_step(mesh: Mesh, model, optimizer, normalizers=None,
                  axis='env'):
    """Data-parallel model update: per-device microbatch, psum'd grads.

    Uses `shard_map` so the gradient all-reduce is an explicit `psum` over
    the mesh axis (rides ICI), with parameters replicated.

    ``axis`` may be one axis name or a tuple — e.g. ``('host', 'env')``
    on a 2-axis mesh shards the batch over BOTH axes and all-reduces
    gradients across the full device grid (the DCN-then-ICI reduction
    XLA emits for a hosts x local-devices layout).

    Returns `step(params, opt_state, batch) -> (params, opt_state, loss)`
    where `batch` dict arrays have a leading dim divisible by the axis size.
    """
    import optax
    from jax import shard_map

    axes = (axis,) if isinstance(axis, str) else tuple(axis)

    def local_step(params, opt_state, batch):
        def loss_fn(p):
            out = model.loss(p, batch, normalizers)
            return out[0] if isinstance(out, tuple) else out

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = jax.lax.pmean(grads, axes)
        loss = jax.lax.pmean(loss, axes)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    sharded = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P(axes)),
        out_specs=(P(), P(), P()),
        check_vma=False)
    return jax.jit(sharded)
